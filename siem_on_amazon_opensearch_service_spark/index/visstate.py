"""Classic visState -> search-body translator: run a reference
dashboard PANEL, not just its query string.

A saved visualization (``attributes.visState`` in
``source/saved_objects/each-dashboard/*.ndjson``) stores its
aggregations as a flat list of Kibana agg configs (id / type /
schema / params). The dashboards' courier nests the bucket configs in
array order and attaches metrics at the deepest level, then POSTs an
ordinary ``_search`` body — this module performs the same assembly
onto ``search_body``'s aggs spec, so every panel shape the reference
ships (315 visualizations: count / terms / filters / date_histogram
buckets; cardinality / sum / max / avg / percentiles / top_hits
metrics; avg_bucket / max_bucket / min_bucket / sum_bucket sibling
pipelines with inline custom buckets) compiles to a runnable body.

Translation notes (each mirrors what the courier sends):

* agg ``id`` becomes the agg name — ``orderBy: "<id>"`` then resolves
  naturally; orderBy of the count metric is ``_count``.
* ``interval: "auto"`` becomes ``auto_date_histogram`` (the courier
  picks a concrete interval from the time range client-side; the
  server-side auto agg is the engine equivalent).
* filters-agg arms keep stored query STRINGS for lucene and
  pre-compile ``kuery`` arms through :mod:`index.kql` (the arm
  language is part of the saved object).
* ``otherBucket`` / ``missingBucket`` params are dropped (the terms
  response decoration, not a different aggregation).
"""

from __future__ import annotations

from .kql import DEFAULT_TEXT_FIELD, KQLError, kibana_filters_to_query, parse_kql

_SIBLING = ("avg_bucket", "max_bucket", "min_bucket", "sum_bucket")


class VisStateError(ValueError):
    pass


def _metric_spec(a: dict) -> dict | None:
    t, p = a["type"], a.get("params", {}) or {}
    if t == "count":
        return None                      # implicit doc_count
    if t == "percentiles":
        return {t: {"field": p["field"],
                    "percents": list(p.get("percents", [50, 95, 99]))}}
    if t == "top_hits":
        sf = p.get("sortField", "doc_id")
        return {"top_hits": {"size": int(p.get("size", 1)),
                             "sort": [{sf: {"order":
                                            p.get("sortOrder", "desc")}}]}}
    if t in ("sum", "max", "min", "avg", "cardinality"):
        return {t: {"field": p["field"]}}
    raise VisStateError(f"unsupported visState metric type {t!r}")


def _bucket_spec(a: dict, default_field: str, now) -> tuple[str, dict]:
    t, p = a["type"], a.get("params", {}) or {}
    if t == "terms":
        return "terms", {"field": p["field"],
                         "size": int(p.get("size", 10))}
    if t == "date_histogram":
        iv = p.get("interval", "auto")
        if iv == "auto":
            return "auto_date_histogram", {"field": p["field"],
                                           "buckets": 30}
        return "date_histogram", {"field": p["field"],
                                  "calendar_interval": iv}
    if t == "histogram":
        return "histogram", {"field": p["field"],
                             "interval": p.get("interval", 1)}
    if t == "filters":
        arms: dict = {}
        for i, fl in enumerate(p.get("filters", [])):
            inp = fl.get("input", {}) or {}
            q = inp.get("query", "")
            label = fl.get("label") or q or f"arm{i}"
            if inp.get("language", "lucene") == "kuery":
                arms[label] = parse_kql(q, default_field, now=now)
            else:
                arms[label] = q
        return "filters", {"filters": arms}
    raise VisStateError(f"unsupported visState bucket type {t!r}")


def visstate_to_aggs(vis: dict,
                     default_field: str = DEFAULT_TEXT_FIELD,
                     now=None) -> dict:
    """The aggs half: nested search-body aggs from the flat visState
    agg list (buckets nest in array order, metrics attach at the
    deepest level, sibling pipelines expand their inline custom
    bucket next to themselves)."""
    aggs = [a for a in vis.get("aggs", []) if a.get("enabled", True)]
    buckets = [a for a in aggs
               if a.get("schema") in ("segment", "group", "split",
                                      "bucket")]
    metrics = [a for a in aggs if a.get("schema") == "metric"]
    metric_types = {a["id"]: a["type"] for a in aggs}

    leaf: dict = {}
    for m in metrics:
        t = m["type"]
        if t == "count":
            continue
        if t in _SIBLING:
            cb = m["params"]["customBucket"]
            cm = m["params"].get("customMetric",
                                 {"id": "m", "type": "count"})
            bkind, bspec = _bucket_spec(cb, default_field, now)
            sub: dict = {bkind: bspec}
            mspec = _metric_spec(cm)
            if mspec is None:
                path = "doc_count"
            else:
                path = str(cm.get("id", "m"))
                sub["aggs"] = {path: mspec}
            bname = f"{m['id']}-bucket"
            leaf[bname] = sub
            leaf[m["id"]] = {t: {"buckets_path": f"{bname}>{path}"}}
            continue
        spec = _metric_spec(m)
        if spec is not None:
            leaf[m["id"]] = spec

    node: dict | None = leaf or None
    for a in reversed(buckets):
        kind, spec = _bucket_spec(a, default_field, now)
        if kind == "terms":
            p = a.get("params", {}) or {}
            ob, odir = p.get("orderBy", "1"), p.get("order", "desc")
            if ob == "_key":
                target = "_key"
            elif ob in metric_types and metric_types[ob] != "count":
                target = str(ob)
            else:
                target = "_count"   # count metric id / "custom" /
                # missing: the courier's effective default
            spec = dict(spec, order={target: odir})
        entry: dict = {kind: spec}
        if node:
            entry["aggs"] = node
        node = {str(a["id"]): entry}
    return node or {}


def visstate_to_body(vis: dict, query=None, filters=None,
                     default_field: str = DEFAULT_TEXT_FIELD,
                     now=None, size: int = 0) -> dict:
    """The whole panel: search-bar query (``(text, language)`` tuple,
    a raw KQL string, or a ready DSL dict) + filter pills + translated
    aggs -> one ``search_body`` request (``size: 0`` — panels render
    aggregations, not hits)."""
    qnode = None
    if isinstance(query, tuple):
        text, lang = query
        qnode = (parse_kql(text, default_field, now=now)
                 if lang == "kuery"
                 else {"query_string": {"query": text}})
    elif isinstance(query, str):
        qnode = parse_kql(query, default_field, now=now)
    elif isinstance(query, dict):
        qnode = query
    body: dict = {
        "query": kibana_filters_to_query(filters, qnode, default_field),
        "size": size,
    }
    aggs = visstate_to_aggs(vis, default_field, now)
    if aggs:
        body["aggs"] = aggs
    return body


# ---------------------------------------------------------------------------
# TSVB ("metrics" visualizations) and timelion expressions
# ---------------------------------------------------------------------------

import re as _re


def tsvb_to_bodies(params: dict,
                   default_field: str = DEFAULT_TEXT_FIELD,
                   now=None) -> dict:
    """TSVB panel (visState type ``metrics``) -> one search body per
    series, the way the TSVB backend fans out: panel filter AND series
    filter in must, a date_histogram timeseries (``>=60m``-style
    intervals become fixed intervals; empty/auto becomes
    auto_date_histogram), metrics at the bucket level named by their
    ids, the ``math`` metric as a ``bucket_script`` over its named
    variables, and a terms split as an enclosing terms level."""
    tf = params.get("time_field", "@timestamp")
    panel_iv = (params.get("interval") or "auto").strip()
    out: dict = {}
    for idx, s in enumerate(params.get("series", [])):
        label = (s.get("label") or "").strip() or s.get("id", str(idx))
        parts = []
        for f in (params.get("filter"), s.get("filter")):
            if isinstance(f, dict) and (f.get("query") or "").strip():
                if f.get("language", "kuery") == "kuery":
                    parts.append(parse_kql(f["query"], default_field,
                                           now=now))
                else:
                    parts.append({"query_string": {"query": f["query"]}})
        q = (parts[0] if len(parts) == 1
             else {"bool": {"must": parts}} if parts
             else {"match_all": {}})
        m = _re.fullmatch(r">?=?(\d+)([smhdw])", panel_iv)
        if m:
            dh_entry: dict = {"date_histogram": {
                "field": tf, "fixed_interval": m.group(1) + m.group(2)}}
        else:
            dh_entry = {"auto_date_histogram": {"field": tf,
                                                "buckets": 30}}
        inner: dict = {}
        for mt in s.get("metrics", []):
            t = mt["type"]
            if t == "count":
                continue
            if t == "math":
                paths = {v["name"]: str(v["field"])
                         for v in mt.get("variables", [])}
                inner[mt["id"]] = {"bucket_script": {
                    "buckets_path": paths,
                    "script": mt.get("script", "")}}
                continue
            if t in ("sum", "min", "max", "avg", "cardinality"):
                inner[mt["id"]] = {t: {"field": mt["field"]}}
                continue
            raise VisStateError(f"unsupported TSVB metric {t!r}")
        if inner:
            dh_entry["aggs"] = inner
        aggs: dict = {"timeseries": dh_entry}
        if s.get("split_mode") == "terms":
            aggs = {"split": {"terms": {
                "field": s["terms_field"],
                "size": int(s.get("terms_size") or 10),
                "order": {"_count": "desc"}}, "aggs": aggs}}
        out[label] = {"query": q, "size": 0, "aggs": aggs}
    return out


_TIMELION_ES = _re.compile(
    r"\.es\(([^)]*)\)((?:\.\w+\([^)]*\))*)")
_TIMELION_CHAIN = _re.compile(r"\.(\w+)\(([^)]*)\)")


def timelion_to_bodies(expression: str, time_field: str = "@timestamp",
                       default_field: str = DEFAULT_TEXT_FIELD) -> dict:
    """Timelion ``.es(...)`` chains -> one search body per series:
    the ``q=`` argument is a Lucene query_string (timelion's default),
    ``index=`` routing is the caller's concern, cosmetic chain
    functions (.label/.color/...) decorate — only .label is read."""
    out: dict = {}
    for i, m in enumerate(_TIMELION_ES.finditer(expression)):
        args, chain = m.group(1), m.group(2)
        q: dict = {"match_all": {}}
        for am in _re.finditer(
                r"(?:(\w+)\s*=\s*)?('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"|[^,]+)",
                args):
            key = am.group(1)
            val = am.group(2).strip()
            if val[:1] in "'\"":
                val = val[1:-1]
            if key == "q" or (key is None and val and "=" not in val):
                if val and val != "*":
                    q = {"query_string": {"query": val}}
        label = f"series{i}"
        for cm in _TIMELION_CHAIN.finditer(chain):
            if cm.group(1) == "label":
                lv = cm.group(2).strip()
                if lv[:1] in "'\"":
                    lv = lv[1:-1]
                label = lv
        out[label] = {"query": q, "size": 0, "aggs": {
            "timeseries": {"auto_date_histogram": {
                "field": time_field, "buckets": 30}}}}
    return out


# ---------------------------------------------------------------------------
# saved-objects export loader (the .ndjson a user downloads)
# ---------------------------------------------------------------------------

def saved_objects_bodies(lines, default_field: str = DEFAULT_TEXT_FIELD,
                         now=None) -> dict:
    """An exported saved-objects ``.ndjson`` (the file Dashboards'
    "Export objects" produces, and what the reference ships under
    ``source/saved_objects/``) -> ``{title: body-or-bodies}`` for
    every DATA panel: classic agg visualizations through
    :func:`visstate_to_body` (search-bar query + filter pills +
    aggs), TSVB through :func:`tsvb_to_bodies` (dict of per-series
    bodies), timelion through :func:`timelion_to_bodies`. Markdown /
    input-control panels carry no data and are skipped. Lines may be
    raw strings or parsed dicts."""
    import json as _json

    out: dict = {}
    for line in lines:
        obj = _json.loads(line) if isinstance(line, str) else line
        if obj.get("type") == "search":
            # a Discover saved search: columns projection + sort +
            # search-bar query + pills -> a HITS body (size 500, the
            # Discover page default)
            attrs = obj.get("attributes", {})
            title = attrs.get("title") or obj.get("id", "")
            query = filters = None
            ss = attrs.get("kibanaSavedObjectMeta", {}).get(
                "searchSourceJSON")
            if ss:
                try:
                    src = _json.loads(ss)
                    query = _source_query(src, default_field, now)
                    filters = src.get("filter")
                except ValueError:
                    pass
            body = {"query": kibana_filters_to_query(
                        filters, query, default_field),
                    "size": 500}
            cols = [c for c in (attrs.get("columns") or [])
                    if c != "_source"]
            if cols:
                body["_source"] = cols
            sort = attrs.get("sort") or []
            if sort and not isinstance(sort[0], (list, tuple)):
                sort = [sort]      # ["ts","desc"] shorthand
            if sort:
                body["sort"] = [{c: {"order": d}} for c, d in sort]
            out[title] = body
            continue
        if obj.get("type") != "visualization":
            continue
        attrs = obj.get("attributes", {})
        try:
            vis = _json.loads(attrs.get("visState") or "{}")
        except ValueError:
            continue
        title = attrs.get("title") or obj.get("id", "")
        vtype = vis.get("type")
        if vtype == "metrics":
            out[title] = tsvb_to_bodies(vis.get("params", {}),
                                        default_field, now=now)
            continue
        if vtype == "timelion":
            out[title] = timelion_to_bodies(
                vis.get("params", {}).get("expression", ""),
                default_field=default_field)
            continue
        if not vis.get("aggs"):
            continue            # markdown / input controls: no data
        query = filters = None
        ss = attrs.get("kibanaSavedObjectMeta", {}).get(
            "searchSourceJSON")
        if ss:
            try:
                src = _json.loads(ss)
                query = _source_query(src, default_field, now)
                filters = src.get("filter")
            except ValueError:
                pass
        out[title] = visstate_to_body(vis, query=query, filters=filters,
                                      default_field=default_field,
                                      now=now)
    return out


def _source_query(src: dict, default_field: str, now) -> dict | None:
    """searchSourceJSON's query half -> a DSL node. The stored query
    may be a string (kuery/lucene text) or already a DSL OBJECT (some
    exports carry the raw query) -- both forms are legal on the
    wire."""
    q = src.get("query") or {}
    if not isinstance(q, dict):
        return None
    inner = q.get("query")
    if isinstance(inner, dict):
        return inner                       # raw DSL object
    if isinstance(inner, str) and inner.strip():
        if q.get("language", "lucene") == "kuery":
            return parse_kql(inner, default_field, now=now)
        return {"query_string": {"query": inner}}
    return None
