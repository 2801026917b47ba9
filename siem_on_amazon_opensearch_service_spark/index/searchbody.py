r"""OpenSearch ``_search`` request-body compiler.

The reference's dashboards and alerting monitors ultimately speak ONE
wire shape: a JSON search body POSTed to ``{index}/_search`` --
``query`` (a recursive DSL tree), ``aggs`` (a recursive bucket/metric
tree), plus ``from``/``size``/``sort``/``_source``.  The loader side
of the reference never builds these itself (OpenSearch does), so this
module is the engine-side half a user of the reference actually
queries through: it compiles the documented public DSL
(match / match_phrase / term / terms / range / exists / prefix /
wildcard / regexp / fuzzy / ids / bool / constant_score / dis_max /
boosting / match_all / query_string / simple_query_string) onto the
same boolean-tree AST the query_string executor runs
(``querystring.tree_scores``), so every body -- however nested --
becomes ONE DataFrame DAG: one shared posting decode, one
groupBy(doc_id), native boolean/arith gating, TakeOrderedAndProject.

Aggregations compile to ONE groupBy over the flattened bucket-key
path per chain (terms -> date_histogram -> metric is a single
shuffle), with per-level terms-size pruning done by windows OVER THE
SAME partitioning (no extra exchange).  Sibling aggs fork into
separate DataFrames (OpenSearch returns them as separate response
sections anyway).

Scale notes (100 TB posture): query compilation is driver-side string
work; execution inherits tree_scores' corpus-size-independent plan
shape (no broadcast of match sets, no join per clause).  The aggs
path is scan -> filter -> partial agg -> final agg; terms-size
pruning happens AFTER the aggregation so the shuffle carries bucket
rows, not documents.

Parity anchors (reference saved_objects/each-dashboard/*.ndjson
visState payloads): guardduty.ndjson stacks cardinality metrics under
terms (size 5, ordered by count) under date_histogram (calendar
intervals) with filters aggs whose arms are stored query_string
strings; cloudtrail.ndjson queries are the grouped/wildcard
query_string shapes the `query_string` node executes.  The alerting
side (reference source/saved_objects monitors) POSTs exactly this
body shape to `_search`.
"""

from __future__ import annotations

import re
from dataclasses import replace as dc_replace
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import tokenize_py
from .build import PostingsIndex
from .querystring import (
    Boosting,
    ConstScore,
    DisMax,
    FieldLeaf,
    FuncScore,
    Group,
    ScriptScore,
    TermLeaf,
    element_pred,
    parse_query_string,
    tree_scores,
)

#: docs-table column that holds the indexed full text's name -- the
#: corpus schema (url, warc_ts, html, text, lang) indexes ``text``.
DEFAULT_TEXT_FIELD = "text"


# ---------------------------------------------------------------------------
# runtime fields (search-time mappings)
# ---------------------------------------------------------------------------

#: OpenSearch runtime-field type -> Spark cast type.
_RUNTIME_TYPES = {
    "keyword": "string", "long": "bigint", "double": "double",
    "boolean": "boolean", "date": "timestamp", "ip": "string",
}


def with_runtime_mappings(ix: PostingsIndex,
                          runtime_mappings: dict) -> PostingsIndex:
    """``runtime_mappings``: search-time computed fields (OpenSearch
    runtime fields, normally a painless ``emit(...)`` script).  Each
    definition derives ONE docs column on the handle, so runtime
    fields work everywhere a mapped field does -- term-level query
    nodes, sort, ``_source``, aggregations (including as the
    significant_terms background set) -- without touching stored data.

    Script forms:

    * ``{"script": {"source": "<sql expr>"}}`` -- one Spark SQL scalar
      expression over the doc columns (the engine's painless stand-in;
      stays inside Catalyst/codegen).
    * ``{"script": [declarative ops]}`` -- the update-by-query script
      surface (``docops.script_exprs``); the runtime field reads its
      own name after the ops run.
    * no script -- field "shadowing": re-reads the same-named stored
      column under the declared type (OpenSearch's script-less runtime
      field reading ``_source``).

    Values take try_cast semantics: a malformed row becomes NULL (the
    runtime fields' lenient read path), never a job abort.
    """
    docs = ix.docs
    for name, spec in runtime_mappings.items():
        typ = _RUNTIME_TYPES[spec.get("type", "keyword")]
        script = spec.get("script")
        if script is None:
            col = F.col(name)
        elif isinstance(script, dict) and "source" in script:
            col = F.expr(script["source"])
        else:
            from .docops import _apply_script, script_exprs
            docs = _apply_script(docs, script_exprs(script))
            col = F.col(name)
        docs = docs.withColumn(name, col.try_cast(typ))
    return dc_replace(ix, docs=docs)


# ---------------------------------------------------------------------------
# more_like_this expansion (needs index stats -> runs before the pure
# compiler)
# ---------------------------------------------------------------------------


def _mlt_bool(body: dict, ix: PostingsIndex,
              source_docs: DataFrame | None, text_field: str) -> dict:
    """Resolve one ``more_like_this`` node into a plain ``bool``
    node: Lucene MLT term selection (tf*idf-ranked characteristic
    terms of the like-texts, ``boolquery.mlt_select_terms``) emits a
    should-group with the resolved minimum_should_match; ``_id``
    likes pull their text from the corpus table (driver-side, k rows)
    and are excluded from hits unless ``include`` (OpenSearch
    default)."""
    from .boolquery import mlt_select_terms

    likes = body.get("like", [])
    if isinstance(likes, (str, dict)):
        likes = [likes]
    texts: list[str] = []
    like_ids: list[int] = []
    for item in likes:
        if isinstance(item, str):
            texts.append(item)
        else:
            like_ids.append(int(item["_id"]))
    if like_ids:
        if source_docs is None:
            raise ValueError(
                "more_like_this with {'_id': ...} likes needs "
                "source_docs (the corpus table with doc_id + text)")
        rows = (source_docs
                .filter(F.col("doc_id").isin(like_ids))
                .select(text_field).collect())
        texts.extend(str(r[text_field]) for r in rows)

    msm_raw = body.get("minimum_should_match", "30%")
    pct = (float(msm_raw[:-1]) / 100.0
           if isinstance(msm_raw, str) and msm_raw.endswith("%")
           else None)
    sel, msm = mlt_select_terms(
        ix, " ".join(texts),
        max_query_terms=int(body.get("max_query_terms", 25)),
        min_term_freq=int(body.get("min_term_freq", 2)),
        min_doc_freq=int(body.get("min_doc_freq", 2)),
        minimum_should_match_pct=0.3 if pct is None else pct)
    if pct is None and not isinstance(msm_raw, str):
        msm = int(msm_raw)
    if not sel:
        return {"match_none": {}}
    out: dict = {
        "should": [{"term": {text_field: {"value": t}}} for t in sel],
        "minimum_should_match": msm,
    }
    if like_ids and not body.get("include", False):
        out["must_not"] = [{"ids": {"values": [str(i) for i in like_ids]}}]
    return {"bool": out}


def expand_mlt(node: dict, ix: PostingsIndex,
               source_docs: DataFrame | None = None,
               text_field: str = DEFAULT_TEXT_FIELD) -> dict:
    """Walk a query-DSL tree and expand every ``more_like_this`` node
    (term selection reads index statistics, so it cannot live in the
    pure ``compile_query``).  Non-MLT subtrees return unchanged."""
    if not isinstance(node, dict) or not node:
        return node
    kind, body = _one(node)

    def rec(n):
        return expand_mlt(n, ix, source_docs, text_field)

    if kind == "more_like_this":
        return _mlt_bool(body, ix, source_docs, text_field)
    if kind == "bool":
        nb = dict(body)
        for occ in ("must", "filter", "should", "must_not"):
            if occ in nb:
                items = nb[occ]
                nb[occ] = (rec(items) if isinstance(items, dict)
                           else [rec(i) for i in items])
        return {"bool": nb}
    if kind == "dis_max":
        nb = dict(body)
        nb["queries"] = [rec(q) for q in body.get("queries", [])]
        return {"dis_max": nb}
    if kind == "constant_score":
        nb = dict(body)
        nb["filter"] = rec(body["filter"])
        return {"constant_score": nb}
    if kind == "boosting":
        nb = dict(body)
        nb["positive"] = rec(body["positive"])
        nb["negative"] = rec(body["negative"])
        return {"boosting": nb}
    if kind == "function_score":
        nb = dict(body)
        if "query" in nb:
            nb["query"] = rec(nb["query"])
        return {"function_score": nb}
    if kind == "script_score":
        nb = dict(body)
        nb["query"] = rec(body["query"])
        return {"script_score": nb}
    if kind == "pinned":
        nb = dict(body)
        nb["organic"] = rec(body["organic"])
        return {"pinned": nb}
    return node


# ---------------------------------------------------------------------------
# query compiler: JSON DSL -> querystring AST
# ---------------------------------------------------------------------------


def _one(spec: dict) -> tuple[str, object]:
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(f"expected single-key query node, got {spec!r}")
    return next(iter(spec.items()))


def _fuzzy_edits(fz, term: str) -> int:
    """``fuzziness`` param -> max edit distance.  ``AUTO[:low,high]``
    is the upstream length ladder: 0 edits below ``low`` (default 3)
    characters, 1 below ``high`` (default 6), else 2."""
    if isinstance(fz, str) and fz.upper().startswith("AUTO"):
        lo, hi = 3, 6
        if ":" in fz:
            a, b = fz.split(":", 1)[1].split(",")
            lo, hi = int(a), int(b)
        n = len(term)
        return 0 if n < lo else (1 if n < hi else 2)
    return int(fz)


def _field_params(body, value_key: str = "value") -> tuple[str, dict]:
    """``{"field": X}`` or ``{"field": {value_key: X, ...opts}}``."""
    field, params = _one(body)
    if not isinstance(params, dict):
        params = {value_key: params}
    return field, params


def resolve_terms_lookup(node, ix: PostingsIndex):
    """Terms-lookup rewrite: the ``{"terms": {field: {"id": ...,
    "path": ...}}}`` form fetches the lookup document's ``path``
    values and splices a literal value list in place — the OpenSearch
    coordinator does the same single GET before broadcasting the
    query. One driver-side single-row fetch per lookup clause; a
    missing doc or null path resolves to the empty list (matches
    nothing), as upstream."""
    if isinstance(node, list):
        return [resolve_terms_lookup(x, ix) for x in node]
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if k == "terms" and isinstance(v, dict) and len(v) == 1:
            (field, spec), = v.items()
            if isinstance(spec, dict) and "id" in spec:
                path = spec.get("path", field)
                rows = (ix.docs
                        .filter(F.col("doc_id") == int(spec["id"]))
                        .select(F.col(path).alias("_v")).collect())
                vals = []
                if rows and rows[0]["_v"] is not None:
                    got = rows[0]["_v"]
                    vals = (list(got) if isinstance(got, (list, tuple))
                            else [got])
                out[k] = {field: [str(x) for x in vals]}
                continue
        out[k] = resolve_terms_lookup(v, ix)
    return out


def compile_query(spec: dict,
                  text_field: str = DEFAULT_TEXT_FIELD) -> object:
    """Compile one OpenSearch query-DSL node into the boolean-tree
    AST.  Full-text node types (match, match_phrase, ...) only apply
    to the indexed ``text_field``; term-level node types on any other
    field become docs-column predicates (FieldLeaf), mirroring
    keyword-field semantics."""
    kind, body = _one(spec)

    if kind == "match_all":
        return Group(boost=float(body.get("boost", 1.0)))
    if kind == "match_none":
        # a should-group with no matchable clause: never matches
        return Group(clauses=[("must", FieldLeaf("doc_id", "in"))])

    if kind == "bool":
        g = Group()
        for occ_json, occ in (("must", "must"), ("filter", "filter"),
                              ("should", "should"),
                              ("must_not", "must_not")):
            items = body.get(occ_json, [])
            if isinstance(items, dict):
                items = [items]
            for item in items:
                g.clauses.append((occ, compile_query(item, text_field)))
        if "minimum_should_match" in body:
            g.minimum_should_match = int(body["minimum_should_match"])
        g.boost = float(body.get("boost", 1.0))
        return g

    if kind == "constant_score":
        return ConstScore(compile_query(body["filter"], text_field),
                          float(body.get("boost", 1.0)))
    if kind == "dis_max":
        return DisMax([compile_query(q, text_field)
                       for q in body.get("queries", [])],
                      float(body.get("tie_breaker", 0.0)))
    if kind == "boosting":
        return Boosting(compile_query(body["positive"], text_field),
                        compile_query(body["negative"], text_field),
                        float(body.get("negative_boost", 0.5)))
    if kind == "function_score":
        inner = compile_query(body.get("query", {"match_all": {}}),
                              text_field)
        fns = body.get("functions")
        if fns is None:
            # single-function shorthand: the function keys live
            # directly in the function_score body
            fn = {k: v for k, v in body.items()
                  if k in ("field_value_factor", "gauss", "exp",
                           "linear", "weight", "random_score",
                           "script_score")}
            fns = [fn] if fn else []
        compiled = []
        for fn in fns:
            cf = dict(fn)
            if cf.get("filter") is not None:
                cf["filter"] = compile_query(cf["filter"], text_field)
            compiled.append(cf)
        mb = body.get("max_boost")
        ms = body.get("min_score")
        return FuncScore(
            child=inner, functions=compiled,
            score_mode=body.get("score_mode", "multiply"),
            boost_mode=body.get("boost_mode", "multiply"),
            max_boost=None if mb is None else float(mb),
            min_score=None if ms is None else float(ms),
            boost=float(body.get("boost", 1.0)),
        )

    if kind in ("query_string", "simple_query_string"):
        # simple_query_string's operator subset (+ - " * |) parses
        # identically under the classic grammar we implement.
        q = body["query"] if isinstance(body, dict) else str(body)
        dop = (body.get("default_operator", "OR")
               if isinstance(body, dict) else "OR")
        return parse_query_string(q, default_operator=dop)

    if kind == "ids":
        vals = tuple(str(v) for v in body.get("values", []))
        return FieldLeaf("doc_id", "in", values=vals)

    if kind == "nested":
        # filter-context nested clause: a single element of the
        # array<struct> column at `path` must satisfy ALL inner
        # clauses (block-join semantics).  The inner AST rides in
        # FieldLeaf.values; _Compiler.field_matched evaluates it with
        # a native higher-order `exists` — per-row codegen, no
        # explode, no join.  Scored top-level nested queries route
        # through _nested_scored instead (score_mode, inner_hits).
        inner = compile_query(body["query"], text_field)
        return FieldLeaf(str(body["path"]), "nested", values=(inner,))

    if kind == "parent_id":
        # join-field child lookup: children of `type` whose routed
        # parent doc is `id`.  Pure docs-column conjunction (the
        # join-field layout stores join_name/join_parent on every
        # row), so it composes inside bool and the aggs path alike.
        return Group(clauses=[
            ("filter", FieldLeaf("join_name", "exact",
                                 str(body["type"]))),
            ("filter", FieldLeaf("join_parent", "exact",
                                 str(body["id"]))),
        ])

    if kind == "match":
        field, params = _field_params(body, "query")
        _require_text(kind, field, text_field)
        terms = tokenize_py(str(params["query"]))
        boost = float(params.get("boost", 1.0))
        occ = ("must" if str(params.get("operator", "or")).lower() == "and"
               else "should")
        g = Group(boost=boost)
        for t in terms:
            edits = (_fuzzy_edits(params["fuzziness"], t)
                     if params.get("fuzziness") else 0)
            # 0 edits == exact: a plain term leaf skips the fuzzy
            # path's vocabulary scan (AUTO makes short terms exact)
            g.clauses.append((occ, TermLeaf("fuzzy", t, max_edits=edits)
                              if edits else TermLeaf("term", t)))
        if "minimum_should_match" in params:
            g.minimum_should_match = int(params["minimum_should_match"])
        return g

    if kind == "match_bool_prefix":
        # the search-as-you-type query: every token a term clause
        # except the LAST, which matches as a prefix (the user is
        # still typing it) -- OpenSearch builds exactly this bool
        field, params = _field_params(body, "query")
        _require_text(kind, field, text_field)
        terms = tokenize_py(str(params["query"]))
        # a trailing non-token char (space/punct) means the last word
        # is complete -- keep it a term, like OpenSearch's analyzer do
        raw = str(params["query"])
        last_open = bool(terms) and bool(raw) and (
            raw[-1].isalnum() or raw[-1] == "_")
        occ = ("must" if str(params.get("operator", "or")).lower() == "and"
               else "should")
        g = Group(boost=float(params.get("boost", 1.0)))
        for i, t in enumerate(terms):
            if i == len(terms) - 1 and last_open:
                g.clauses.append((occ, TermLeaf("prefix", t)))
            else:
                g.clauses.append((occ, TermLeaf("term", t)))
        if "minimum_should_match" in params:
            g.minimum_should_match = int(params["minimum_should_match"])
        return g

    if kind in ("match_phrase", "match_phrase_prefix"):
        field, params = _field_params(body, "query")
        _require_text(kind, field, text_field)
        leaf_kind = "phrase" if kind == "match_phrase" else "phrase_prefix"
        return TermLeaf(leaf_kind, str(params["query"]),
                        boost=float(params.get("boost", 1.0)),
                        slop=int(params.get("slop", 0)))

    if kind == "term":
        field, params = _field_params(body)
        v = params["value"]
        if field == text_field:
            return TermLeaf("term", str(v).lower(),
                            boost=float(params.get("boost", 1.0)))
        return FieldLeaf(field, "exact", str(v))

    if kind == "terms":
        field, vals = _one(body)
        if field == text_field:
            return Group(clauses=[
                ("should", TermLeaf("term", str(v).lower())) for v in vals
            ])
        return FieldLeaf(field, "in", values=tuple(str(v) for v in vals))

    if kind == "range":
        field, params = _one(body)
        lo = params.get("gte", params.get("gt"))
        hi = params.get("lte", params.get("lt"))
        return FieldLeaf(
            field, "range",
            lo=None if lo is None else str(lo),
            hi=None if hi is None else str(hi),
            lo_incl="gte" in params or "gt" not in params,
            hi_incl="lte" in params or "lt" not in params,
        )

    if kind == "exists":
        return FieldLeaf(body["field"], "exists")

    if kind in ("geo_bounding_box", "geo_distance", "geo_polygon",
                "geo_shape"):
        # geo filter context over a geo_point struct column: each
        # desugars to ONE closed-form shared-dialect SQL boolean
        # (operators/geo.py) — codegen, no UDF, and the identical
        # text serves as the correctness oracle.
        from ..operators.geo import (bbox_sql, haversine_sql,
                                     point_in_polygon_sql)

        params = {k: v for k, v in body.items()
                  if k not in ("validation_method", "ignore_unmapped",
                               "distance", "distance_type", "relation")}
        field, spec = _one(params)
        lat, lon = f"{field}.lat", f"{field}.lon"
        if kind == "geo_bounding_box":
            tl, br = spec["top_left"], spec["bottom_right"]
            return FieldLeaf(field, "sql_expr", value=bbox_sql(
                lat, lon, float(tl["lat"]), float(tl["lon"]),
                float(br["lat"]), float(br["lon"])))
        if kind == "geo_distance":
            m = re.match(r"^([\d.]+)\s*(m|km|mi|ft)$",
                         str(body["distance"]))
            if not m:
                raise ValueError(f"bad distance {body['distance']!r}")
            km = float(m.group(1)) * {"m": 1e-3, "km": 1.0,
                                      "mi": 1.609344,
                                      "ft": 0.0003048}[m.group(2)]
            return FieldLeaf(field, "sql_expr", value=(
                f"({haversine_sql(lat, lon, float(spec['lat']), float(spec['lon']))}"
                f" <= {km!r})"))
        # geo_polygon, or a geo_shape (relation: intersects over the
        # doc POINT == containment test). Shapes: polygon,
        # multipolygon (OR of outer-ring containments), envelope
        # (bbox — GeoJSON [[minlon, maxlat], [maxlon, minlat]]).
        def _ring(coords) -> list[tuple[float, float]]:
            # GeoJSON rings are (lon, lat); first ring = outer; drop
            # an explicit closing vertex (the SQL closes the ring)
            pts = [(float(p[1]), float(p[0])) for p in coords]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            return pts

        if kind == "geo_shape":
            shp = spec["shape"] if isinstance(spec, dict) else spec
            styp = str(shp.get("type", "")).lower()
            if styp == "envelope":
                (l, t), (r, b) = shp["coordinates"]
                return FieldLeaf(field, "sql_expr", value=bbox_sql(
                    lat, lon, float(t), float(l), float(b), float(r)))
            if styp == "multipolygon":
                parts = [point_in_polygon_sql(lat, lon,
                                              _ring(poly[0]))
                         for poly in shp["coordinates"]]
                return FieldLeaf(field, "sql_expr",
                                 value="(" + " OR ".join(parts) + ")")
            if styp != "polygon":
                raise ValueError(
                    "geo_shape: only polygon / multipolygon / "
                    "envelope shapes over geo_point docs are "
                    "supported")
            pts = _ring(shp["coordinates"][0])
        else:
            pts = [(float(p["lat"]), float(p["lon"]))
                   for p in spec["points"]]
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
        return FieldLeaf(field, "sql_expr",
                         value=point_in_polygon_sql(lat, lon, pts))

    if kind in ("prefix", "wildcard", "regexp"):
        field, params = _field_params(body)
        v = str(params["value"])
        boost = float(params.get("boost", 1.0))
        if field == text_field:
            return TermLeaf(kind, v.lower(), boost=boost)
        if kind == "prefix":
            return FieldLeaf(field, "wildcard", v + "*")
        if kind == "wildcard":
            return FieldLeaf(field, "wildcard", v)
        raise ValueError("regexp on non-text fields is not supported")

    if kind == "rank_feature":
        # rank_feature: match docs where the (numeric, positive)
        # feature column exists; score = boost * saturation-fn(value).
        # Desugars onto FuncScore so the one scoring pipeline handles
        # it: child gates (value > 0), boost_mode=replace makes the
        # function value THE score.
        field = body["field"]
        fn: dict = {"rank_feature": {"field": field}}
        for fkind in ("saturation", "log", "sigmoid"):
            if fkind in body:
                fn["rank_feature"][fkind] = body[fkind]
        if len(fn["rank_feature"]) == 1:
            raise ValueError(
                "rank_feature needs saturation{pivot}/log/sigmoid "
                "(the geometric-mean default pivot would be a corpus "
                "stats job; precompute and pass it)")
        gate = compile_query({"range": {field: {"gt": 0}}}, text_field)
        return FuncScore(
            child=gate, functions=[fn], score_mode="sum",
            boost_mode="replace", boost=float(body.get("boost", 1.0)),
        )

    if kind == "fuzzy":
        field, params = _field_params(body)
        _require_text(kind, field, text_field)
        val = str(params["value"]).lower()
        edits = _fuzzy_edits(params.get("fuzziness", 1), val)
        return TermLeaf("fuzzy" if edits else "term", val,
                        boost=float(params.get("boost", 1.0)),
                        max_edits=edits)

    if kind == "script_score":
        ms = body.get("min_score")
        node = ScriptScore(
            child=compile_query(body["query"], text_field),
            source=str(body["script"]["source"]
                       if isinstance(body["script"], dict)
                       else body["script"]),
            min_score=None if ms is None else float(ms),
            boost=float(body.get("boost", 1.0)),
        )
        node.parsed()   # reject unsupported script syntax at compile
        return node

    if kind == "distance_feature":
        # matches docs that HAVE the field; contributes
        # boost * pivot / (pivot + |value - origin|) as the score.
        # Desugars onto FuncScore exactly like rank_feature.
        field = body["field"]
        gate = FieldLeaf(field, "exists")
        fn = {"distance_feature": {"field": field,
                                   "origin": body["origin"],
                                   "pivot": body["pivot"]}}
        return FuncScore(
            child=Group(clauses=[("filter", gate)]), functions=[fn],
            score_mode="sum", boost_mode="replace",
            boost=float(body.get("boost", 1.0)),
        )

    if kind == "pinned":
        # promoted ids rank first, in list order, above every organic
        # hit: a DisMax where pin i scores PIN_BASE - i (constant,
        # far above any BM25 score) and the organic child keeps its
        # own score.  max() picks the pin when both match — exactly
        # the Lucene implementation's float-max-decrement trick.
        ids = [str(v) for v in body.get("ids", [])]
        organic = compile_query(body.get("organic", {"match_all": {}}),
                                text_field)
        pin_base = 1.0e12
        pins = [
            ConstScore(FieldLeaf("doc_id", "in", values=(i,)),
                       boost=pin_base - rank)
            for rank, i in enumerate(ids)
        ]
        return DisMax(children=[organic, *pins], tie_breaker=0.0)

    if kind == "script":
        # filter-context script query: a restricted-Painless boolean
        # predicate over docs columns (one native expression).
        src = body["script"]
        src = src["source"] if isinstance(src, dict) else str(src)
        leaf = FieldLeaf("", "script", value=str(src))
        from .painless import parse_script
        parse_script(str(src))   # reject unsupported syntax at compile
        return leaf

    if kind == "wrapper":
        # base64-wrapped query JSON (the saved-objects escape hatch)
        import base64
        import json
        return compile_query(
            json.loads(base64.b64decode(body["query"])), text_field)

    if kind == "terms_set":
        field, params = _one(body)
        terms = tuple(str(v) for v in params["terms"])
        msm_f = params.get("minimum_should_match_field")
        msm_c = params.get("minimum_should_match")
        if msm_f is None and msm_c is None:
            raise ValueError(
                "terms_set needs minimum_should_match_field or a "
                "constant minimum_should_match")
        return FieldLeaf(field, "terms_set", values=terms,
                         msm_field=msm_f,
                         msm_const=None if msm_c is None else int(msm_c))

    raise ValueError(f"unsupported query DSL node: {kind!r}")


def _require_text(kind: str, field: str, text_field: str) -> None:
    if field != text_field:
        raise ValueError(
            f"{kind} targets the indexed text field "
            f"({text_field!r}); got {field!r}"
        )


# ---------------------------------------------------------------------------
# nested queries (array<struct> element scope)
# ---------------------------------------------------------------------------


def _nested_scored(ix: PostingsIndex, body: dict,
                   text_field: str) -> DataFrame:
    """Top-level ``nested`` query: docs where ONE element of the
    ``array<struct>`` column at ``path`` satisfies ALL inner clauses
    (reference mapping deploy_es/data.ini:280 declares 15 nested
    fields — threat.enrichments etc.; upstream executes this as a
    Lucene block join).

    Spark-first: the element scan is a native higher-order
    ``filter`` over the array column — per-row whole-stage codegen,
    no explode, no join, no shuffle; exactly the right shape at
    100 TB where a child table would force a parent-child shuffle
    join per query.  Inner clauses are term-level filters (constant
    element score 1.0), so score_mode sum = matching-element count
    and none/avg/max/min = 1.0, matching the upstream constant-score
    case.  ``inner_hits`` attaches the first ``size`` matching
    elements as an array column named by ``inner_hits.name``
    (default: the path)."""
    path = str(body["path"])
    mode = str(body.get("score_mode", "avg"))
    if mode not in ("none", "avg", "sum", "max", "min"):
        raise ValueError(f"nested: bad score_mode {mode!r}")
    root = path.split(".")[0]
    if root not in ix.docs.columns:
        if body.get("ignore_unmapped"):
            return (ix.docs.filter(F.lit(False))
                    .withColumn("score", F.lit(1.0)))
        raise ValueError(f"nested path {path!r} is not mapped "
                         "(no such docs column)")
    inner = compile_query(body["query"], text_field)
    arr = F.col(path)
    matches = F.filter(arr, lambda e: element_pred(inner, path, e))
    n = F.size(matches)          # NULL array -> -1: never matches
    # filter-context element scores are 1.0, so sum = element count;
    # none carries score 0 (ToParentBlockJoinQuery ScoreMode.None)
    score = (n.cast("double") if mode == "sum"
             else F.lit(0.0) if mode == "none" else F.lit(1.0))
    out = ix.docs.filter(n > 0).withColumn("score", score)
    ih = body.get("inner_hits")
    if ih is not None:
        # default name "inner_hits", NOT the path: in the flat column
        # model a path-named column would overwrite the source array
        # (truncated to the matching slice) for _source and any later
        # sort over the same field
        iname = str(ih.get("name", "inner_hits"))
        out = out.withColumn(
            iname, F.slice(matches, 1, int(ih.get("size", 3))))
    return out


# ---------------------------------------------------------------------------
# join fields: has_child / has_parent
# ---------------------------------------------------------------------------


def _join_field_scored(ix: PostingsIndex, qkind: str, body: dict,
                       positional_ix: PostingsIndex | None,
                       text_field: str) -> DataFrame:
    """OpenSearch join-field queries over a single index whose docs
    table carries the join layout: ``join_name`` (the relation name)
    and ``join_parent`` (the parent doc_id, NULL on roots) — the
    parent-join field type, where children are routed to the parent's
    shard.  Column names override via ``join_name_field`` /
    ``join_parent_field`` in the body.

    ``has_child``: parents with >=min_children (<=max_children)
    matching children of ``type``; score_mode none|sum|max|min|avg
    over child scores.  ``has_parent``: children whose parent of
    ``parent_type`` matches; ``score: true`` propagates the parent's
    score (else constant 1.0, the Lucene filter behavior).

    Plan at scale: the inner query is the usual one-scan tree; the
    family rollup is ONE groupBy on the parent key, and the final
    attach is a doc_id equi-join — with docs bucketed by the routing
    key (coalesce(join_parent, doc_id)) both co-locate, and a
    selective inner query leaves a small side AQE broadcasts."""
    name_col = body.get("join_name_field", "join_name")
    parent_col = body.get("join_parent_field", "join_parent")
    for c in (name_col, parent_col):
        if c not in ix.docs.columns:
            raise ValueError(f"join-field query needs docs column {c!r}")
    inner = compile_query(body["query"], text_field)
    matched = tree_scores(ix, inner, positional_ix=positional_ix,
                          with_docs=True)
    if matched is None:    # match_all inner query
        matched = ix.docs.withColumn("score", F.lit(1.0))

    ih = body.get("inner_hits")
    iname = str(ih.get("name", "inner_hits")) if ih is not None else None
    if qkind == "has_child":
        child_type = str(body["type"])
        mode = str(body.get("score_mode", "none"))
        agg = {"none": F.lit(1.0), "sum": F.sum("score"),
               "max": F.max("score"), "min": F.min("score"),
               "avg": F.avg("score")}
        if mode not in agg:
            raise ValueError(f"bad score_mode {mode!r}")
        kids_m = matched.filter(
            (F.col(name_col) == child_type)
            & F.col(parent_col).isNotNull())
        extra = []
        if ih is not None:
            # top-k matching children per parent, collected in the
            # SAME family groupBy (WindowGroupLimit bounds the ranked
            # rows; score_mode still aggregates over ALL children)
            isize = int(ih.get("size", 3))
            iw = Window.partitionBy(parent_col).orderBy(
                F.desc("score"), F.asc("doc_id"))
            kids_m = kids_m.withColumn("_irn", F.row_number().over(iw))
            extra = [
                F.array_sort(F.collect_list(F.when(
                    F.col("_irn") <= isize,
                    F.struct(F.col("_irn").alias("rank"),
                             F.col("doc_id").alias("doc_id"),
                             F.col("score").alias("score"))
                ))).alias(iname)
            ]
        fam = (
            kids_m
            .groupBy(F.col(parent_col).alias("doc_id"))
            .agg(F.count("*").alias("_n_children"),
                 (agg[mode] if mode != "none" else F.first(F.lit(1.0)))
                 .alias("score"), *extra)
            .filter(F.col("_n_children")
                    >= int(body.get("min_children", 1)))
        )
        if body.get("max_children") is not None:
            fam = fam.filter(
                F.col("_n_children") <= int(body["max_children"]))
        return ix.docs.join(fam.drop("_n_children"), "doc_id")

    # has_parent: children of matched parents
    parent_type = str(body["parent_type"])
    keep_score = bool(body.get("score", False))
    parents = (matched.filter(F.col(name_col) == parent_type)
               .select(F.col("doc_id").alias("_parent_id"),
                       F.col("score").alias("_parent_score")))
    kids = ix.docs.filter(F.col(parent_col).isNotNull())
    out = kids.join(parents,
                    kids[parent_col] == parents["_parent_id"])
    score = (F.col("_parent_score") if keep_score
             else F.lit(1.0)).alias("score")
    cols = [*[kids[c] for c in kids.columns], score]
    if ih is not None:
        cols.append(F.array(F.struct(
            F.lit(1).alias("rank"),
            F.col("_parent_id").alias("doc_id"),
            F.col("_parent_score").alias("score"))).alias(iname))
    return out.select(*cols)


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------


def search_hits(
    ix: PostingsIndex,
    body: dict,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
    vecs: DataFrame | None = None,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_docs: DataFrame | None = None,
    sparse=None,
    multi_ix=None,
    prescored: DataFrame | None = None,
) -> DataFrame:
    """Execute the body's query + sort/from/size/_source, returning
    the hits page.  Default sort is (_score desc, doc_id asc); a
    ``sort`` list of ``{"field": {"order": "asc"|"desc"}}`` /
    ``"field"`` entries (``"_score"`` allowed) overrides it, always
    with the doc_id tiebreak appended (OpenSearch uses _id/_shard_doc
    the same way).

    ``prescored``: an already-computed (docs + score) matched frame —
    search_body passes its shared matched set so hits and aggs
    execute the query ONCE; query compilation is skipped entirely.

    Vector search: a top-level ``knn`` query (optionally with a
    term-level ``filter``) scores by cosine over the ``vecs`` table
    (pass the embeddings DataFrame; ids share the doc_id space), and
    a top-level ``hybrid`` query executes each sub-query to
    ``pagination_depth`` and fuses by RRF (the 2.x
    score-ranker-processor default)."""
    if prescored is not None:
        scored = prescored
        if "rescore" in body:
            scored = apply_rescore(ix, scored, body, text_field,
                                   positional_ix)
        return hits_page(scored, body, text_field, source_docs)
    if body.get("runtime_mappings"):
        ix = with_runtime_mappings(ix, body["runtime_mappings"])
    qnode = expand_mlt(body.get("query", {"match_all": {}}), ix,
                       source_docs, text_field)
    qnode = resolve_terms_lookup(qnode, ix)
    qkind, _ = _one(qnode)
    if qkind == "intervals":
        # intervals is the modern position-algebra surface over the
        # same machinery: desugar onto the span executor.  A tree
        # that provably matches nothing (prefix with no vocabulary
        # expansion) becomes match_none.
        if positional_ix is None:
            raise ValueError("intervals queries need a positional index")
        from .spans import intervals_to_span
        span_node = intervals_to_span(qnode["intervals"], positional_ix)
        qnode = span_node if span_node is not None else {"match_none": {}}
        qkind, _ = _one(qnode)
    if qkind.startswith("span_"):
        if positional_ix is None:
            raise ValueError("span queries need a positional index")
        from .spans import span_scores
        scored = (span_scores(positional_ix, qnode,
                              text_field=text_field)
                  .join(ix.docs, "doc_id", "left"))
    elif qkind in ("has_child", "has_parent"):
        scored = _join_field_scored(ix, qkind, qnode[qkind],
                                    positional_ix, text_field)
    elif qkind == "nested":
        # top-level nested gets the dedicated path (score_mode,
        # inner_hits, ignore_unmapped); nested INSIDE bool flows
        # through compile_query as a filter clause
        scored = _nested_scored(ix, qnode["nested"], text_field)
    elif qkind in ("knn", "hybrid"):
        scored = _vector_scored(ix, qnode, positional_ix, text_field,
                                vecs, vec_id_col, vec_col, sparse=sparse)
    elif qkind == "neural_sparse":
        scored = _sparse_scored(ix, qnode, sparse)
    elif qkind in ("multi_match", "combined_fields"):
        scored = _multi_scored(ix, qkind, qnode[qkind], multi_ix)
    else:
        tree = compile_query(qnode, text_field)
        scored = tree_scores(ix, tree, positional_ix=positional_ix,
                             with_docs=True)
        if scored is None:  # empty tree == match_all
            scored = ix.docs.withColumn("score", F.lit(1.0))
    if body.get("terminate_after"):
        # early termination: cap doc COLLECTION at terminate_after
        # (like the per-shard collector cap -- which subset is
        # collection-order-dependent there too). Spark's limit
        # short-circuits the scan, so the cap genuinely bounds cost.
        scored = scored.limit(int(body["terminate_after"]))
    if "rescore" in body:
        scored = apply_rescore(ix, scored, body, text_field,
                               positional_ix)
    return hits_page(scored, body, text_field, source_docs)


def apply_rescore(
    ix: PostingsIndex,
    scored: DataFrame,
    body: dict,
    text_field: str = DEFAULT_TEXT_FIELD,
    positional_ix: PostingsIndex | None = None,
) -> DataFrame:
    """``rescore``: re-rank the top ``window_size`` hits with a second
    (usually more expensive, e.g. phrase) query --
    ``qw * base + rw * rescore`` (score_mode total, the default; also
    multiply/avg/max/min).  Docs inside the window that don't match
    the rescore query keep ``qw * base``.

    Plan shape: the window is a TakeOrderedAndProject (k rows, never
    the corpus) broadcast into the rescore scores -- the rescore
    query's cost is bounded by ITS postings, the join by the window.
    The returned frame IS the window: the page must fit inside it
    (from+size <= window_size, enforced), matching how rescore is
    actually used."""
    spec = body["rescore"]
    window = int(spec.get("window_size", 10))
    frm, size = int(body.get("from", 0)), int(body.get("size", 10))
    if frm + size > window:
        raise ValueError(
            f"rescore window_size {window} < from+size {frm + size}")
    rq = spec["query"]
    qw = float(rq.get("query_weight", 1.0))
    rw = float(rq.get("rescore_query_weight", 1.0))
    mode = rq.get("score_mode", "total")
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(window)
    rs = tree_scores(ix, compile_query(rq["rescore_query"], text_field),
                     positional_ix=positional_ix)
    if rs is None:
        return top
    rs = rs.withColumnRenamed("score", "_rs")
    # left join preserving the window; the preserved side of an outer
    # join can never be the broadcast build side, so AQE picks the
    # strategy for rs (broadcast when small; a shuffle here is bounded
    # by the RESCORE query's match set, never the corpus)
    joined = top.join(rs, "doc_id", "left")
    base = F.col("score") * F.lit(qw)
    resc = F.col("_rs") * F.lit(rw)
    combos = {
        "total": base + resc,
        "multiply": base * resc,
        "avg": (base + resc) / F.lit(2.0),
        "max": F.greatest(base, resc),
        "min": F.least(base, resc),
    }
    if mode not in combos:
        raise ValueError(f"bad rescore score_mode {mode!r}")
    new = F.when(F.col("_rs").isNotNull(), combos[mode]).otherwise(base)
    return joined.withColumn("score", new).select(*top.columns)


def hits_page(
    scored: DataFrame,
    body: dict,
    text_field: str = DEFAULT_TEXT_FIELD,
    source_docs: DataFrame | None = None,
) -> DataFrame:
    """post_filter / sort / search_after / from+size / highlight /
    _source over an already-scored matched set -- the response-page
    half of ``search_hits``, shared with the ``_msearch`` batch
    executor (which computes all bodies' scored sets in one DAG)."""
    # post_filter: term-level predicate applied to the HITS only --
    # aggregations still see the full query-matched set (the classic
    # dashboards faceted-navigation contract).
    if "post_filter" in body:
        scored = scored.filter(
            _filter_pred(body["post_filter"], text_field,
                         frame=scored))

    if "min_score" in body:
        # top-level min_score: drop hits below the floor BEFORE
        # pagination (aggs still see the full matched set, like the
        # wire contract -- this runs on the hits path only)
        scored = scored.filter(
            F.col("score") >= float(body["min_score"]))

    spec = (_sort_spec(body.get("sort", []), text_field)
            + [(F.col("doc_id"), False, False)])
    order = _ordered(spec)

    if "collapse" in body:
        # field collapsing: keep only the best hit (by the request's
        # sort) per collapse-key value.  One window partitioned by
        # the key -- the shuffle carries matched docs hashed by key,
        # never a global sort.
        cspec = body["collapse"]
        ckey = cspec["field"]
        pre_collapse = scored
        cw = Window.partitionBy(ckey).orderBy(*order)
        scored = (scored.withColumn("_crn", F.row_number().over(cw))
                  .filter(F.col("_crn") == 1).drop("_crn"))
        if "inner_hits" in cspec:
            # per-group top hits riding on each collapsed hit as an
            # ordered array<struct(doc_id, score)> column. The ranked
            # window + per-key fold run over the SAME key-hashed
            # shuffle the collapse itself needs (WindowGroupLimit
            # bounds the fold input to size rows/key); the join back
            # is collapsed-keys-sized.
            ih = cspec["inner_hits"]
            # flat column model: the wire default name (the collapse
            # field itself) would collide with the key column
            iname = str(ih.get("name", "inner_hits"))
            isize = int(ih.get("size", 3))
            ispec = (_sort_spec(ih["sort"], text_field)
                     + [(F.col("doc_id"), False, False)]
                     if ih.get("sort") else spec)
            iorder = _ordered(ispec)
            iw = Window.partitionBy(ckey).orderBy(*iorder)
            inner = (
                pre_collapse
                .withColumn("_irn", F.row_number().over(iw))
                .filter(F.col("_irn") <= isize)
                .groupBy(ckey)
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct(
                            F.col("_irn").alias("rank"),
                            F.col("doc_id").alias("doc_id"),
                            F.col("score").alias("score"),
                        ))
                    ).alias(iname)
                )
            )
            scored = scored.join(inner, ckey, "left")

    if "search_after" in body:
        # deep-pagination cursor: a filter, not an offset -- page N
        # costs the same as page 1 (the from/size path re-sorts
        # from+size rows; this one never does)
        scored = scored.filter(_after_pred(spec, body["search_after"]))

    frm = int(body.get("from", 0))
    size = int(body.get("size", 10))
    out = scored.orderBy(*order).limit(frm + size)
    if frm:
        # page offset within the already-bounded top (from+size) rows:
        # the window runs over <=frm+size rows, never the corpus.
        w = Window.orderBy(*order)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") > frm).drop("_rn"))

    if "highlight" in body:
        out = _with_highlight(out, body, text_field, source_docs)

    if "script_fields" in body:
        # per-hit computed fields: restricted-Painless expressions
        # evaluated over the BOUNDED page rows (never the corpus),
        # with _score available like the script_score context.
        from .painless import parse_script, to_column
        for fname, fbody in body["script_fields"].items():
            src = fbody["script"]
            src = src["source"] if isinstance(src, dict) else str(src)
            out = out.withColumn(fname, to_column(
                parse_script(src), {"_score": F.col("score")}))

    src = body.get("_source")
    flds = body.get("fields") or []
    dvf = body.get("docvalue_fields") or []
    stored = body.get("stored_fields")
    if src is True and not (flds or dvf or stored is not None):
        # "_source": true alone == the default full-source hits
        src = None
    if (src is not None or flds or dvf or stored is not None):
        keep = ["doc_id"]
        if src is True:
            # full source, with fields/stored_fields riding along
            keep += [c for c in out.columns if c not in keep]
        if stored == "_none_" or src is False:
            # metadata-only hits (the wire's stored_fields:_none_ /
            # _source:false): doc_id + score, plus whatever the body
            # explicitly computed (fields / script_fields / highlight)
            pass
        elif isinstance(src, str):
            # single pattern shorthand ("obj.*" in the wire contract)
            keep += _resolve_field_patterns([src], out.columns)
        elif isinstance(src, dict):
            # {"includes": [...], "excludes": [...]} object form,
            # wildcards in both lists
            inc = src.get("includes") or ["*"]
            cand = _resolve_field_patterns(inc, out.columns)
            exc = set(_resolve_field_patterns(
                src.get("excludes") or [], out.columns))
            keep += [c for c in cand
                     if c not in exc and c not in ("doc_id", "score")]
        elif isinstance(src, (list, tuple)):
            keep += [c for c in _resolve_field_patterns(src, out.columns)
                     if c not in keep]
        # ``fields`` (the modern retrieval option) and
        # ``docvalue_fields`` both read columns -- in this engine every
        # column IS a doc value (parquet columnar), so they share one
        # resolution path; wildcard patterns per the wire contract.
        for group in (flds, dvf):
            keep += [c for c in _resolve_field_patterns(
                group, out.columns) if c not in keep]
        if isinstance(stored, (list, tuple)):
            missing = [s for s in stored if s not in out.columns]
            if missing:
                raise ValueError(
                    f"stored_fields not stored on the hits: {missing}")
            keep += [c for c in stored if c not in keep]
        if "score" not in keep:
            keep.append("score")
        if "highlight" in body:
            keep += [c for c in out.columns
                     if c == "highlight" or c.startswith("highlight_")]
        qn = body.get("query", {})
        for ih in (body.get("collapse", {}).get("inner_hits"),
                   *(qn.get(jk, {}).get("inner_hits")
                     for jk in ("has_child", "has_parent",
                                "nested"))):
            if ih:
                iname = str(ih.get("name", "inner_hits"))
                if iname not in keep:
                    keep.append(iname)
        # script fields ride alongside _source (the wire contract
        # returns them in a separate "fields" section)
        keep += [c for c in body.get("script_fields", {})
                 if c not in keep]
        out = out.select(*keep)
    return out


def _resolve_field_patterns(patterns, columns) -> list[str]:
    """Resolve a ``fields`` / ``docvalue_fields`` list (names,
    ``{"field": name}`` objects, ``*``/``?`` wildcards) against the
    hit columns.  Wildcard expansion is sorted for determinism; a
    pattern matching nothing contributes nothing (the wire contract:
    unknown fields are silently absent from the response)."""
    import fnmatch

    cols = list(columns)
    out: list[str] = []
    for p in patterns:
        name = p["field"] if isinstance(p, dict) else str(p)
        if "*" in name or "?" in name:
            out += [c for c in sorted(cols)
                    if fnmatch.fnmatchcase(c, name)]
        elif name in cols:
            out.append(name)
    seen: set[str] = set()
    uniq = []
    for c in out:
        if c not in seen:
            seen.add(c)
            uniq.append(c)
    return uniq


def _with_highlight(page: DataFrame, body: dict, text_field: str,
                    source_docs: DataFrame | None) -> DataFrame:
    """Unified-highlighter subset over the (bounded) hits page, pure
    native expressions over page-size rows -- never the corpus.

    Default shape (one field = ``text_field``, no
    ``number_of_fragments``): a single ``highlight`` string column --
    one fragment around the first query-term occurrence, every term
    occurrence inside it wrapped in pre/post tags.

    Extended shape (any other ``fields`` entry, or
    ``number_of_fragments`` set): per-field ``highlight_<field>``
    array<string> columns of up to N non-overlapping fragments
    (context windows captured by one regexp_extract_all pass), with
    ``no_match_size`` falling back to the text head.  Terms match in
    every requested field (``require_field_match: false`` semantics
    -- the engine's scoring fields live in the index, not the page)."""
    import re as _re

    hl = body["highlight"]
    fields: dict = hl.get("fields") or {text_field: {}}

    from .querystring import _walk
    leaves: list = []
    _walk(compile_query(body.get("query", {"match_all": {}}),
                        text_field), leaves)
    terms = sorted({l.text for l in leaves
                    if isinstance(l, TermLeaf) and l.kind == "term"})

    legacy = (list(fields) == [text_field]
              and "number_of_fragments" not in hl
              and "number_of_fragments" not in fields[text_field])

    if not terms:
        if legacy:
            return page.withColumn(
                "highlight", F.lit(None).cast("string"))
        out = page
        for fname in fields:
            out = out.withColumn(
                f"highlight_{fname}",
                F.lit(None).cast("array<string>"))
        return out

    need = [f for f in fields if f not in page.columns]
    cols = list(page.columns)
    if need:
        if source_docs is None:
            raise ValueError(
                "highlight needs the document text: pass source_docs= "
                f"(the docs table does not carry {need!r})"
            )
        page = page.join(
            source_docs.select(
                "doc_id", *[F.col(f).alias(f"_hl_{f}") for f in need]),
            "doc_id", "left")
    srccol = {f: F.col(f"_hl_{f}") if f in need else F.col(f)
              for f in fields}

    alts = "|".join(_re.escape(t) for t in terms)
    pat = f"(?i)\\b({alts})\\b"

    out = page
    new_cols = []
    for fname, fspec in fields.items():
        fspec = fspec or {}
        frag_size = int(fspec.get("fragment_size",
                                  hl.get("fragment_size", 100)))
        pre = (fspec.get("pre_tags") or hl.get("pre_tags")
               or ["<em>"])[0]
        post = (fspec.get("post_tags") or hl.get("post_tags")
                or ["</em>"])[0]
        txt = srccol[fname]
        if legacy:
            pos = F.regexp_instr(txt, F.lit(pat))
            frag = F.substring(
                txt,
                F.greatest(pos - frag_size // 4, F.lit(1)).cast("int"),
                frag_size,
            )
            snippet = F.when(
                pos > 0, F.regexp_replace(frag, pat, f"{pre}$1{post}")
            ).otherwise(F.lit(None).cast("string"))
            new_cols.append(snippet.alias("highlight"))
            continue
        nfrags = int(fspec.get("number_of_fragments",
                               hl.get("number_of_fragments", 5)))
        ctx = max(frag_size // 4, 1)
        # one pass captures non-overlapping context windows around
        # each surviving occurrence; slice bounds them to N
        fragpat = f"(?is).{{0,{ctx}}}\\b(?:{alts})\\b.{{0,{ctx}}}"
        frags = F.slice(
            F.regexp_extract_all(txt, F.lit(fragpat), 0), 1,
            max(nfrags, 1))
        frags = F.transform(
            frags, lambda s: F.regexp_replace(s, pat, f"{pre}$1{post}"))
        nms = int(fspec.get("no_match_size",
                            hl.get("no_match_size", 0)))
        if nms > 0:
            frags = F.when(F.size(frags) > 0, frags).otherwise(
                F.array(F.substring(txt, 1, nms)))
        new_cols.append(frags.alias(f"highlight_{fname}"))
    return out.select(*cols, *new_cols)


def _multi_value_sort_col(fname: str, opts: dict,
                          text_field: str) -> Column:
    """Sort ``mode`` + ``nested`` options: reduce a multi-valued
    field (plain array, or a nested ``array<struct>`` element field,
    optionally restricted by the sort's ``nested.filter``) to ONE
    sort key per doc — upstream's MultiValueMode.  All native array
    folds, per-row codegen: min/max/sum/avg, and median averaging the
    two middle values on even counts exactly like Lucene's
    MultiValueMode.MEDIAN.  Docs with no (matching) values sort as
    NULL (the missing bucket)."""
    nopts = opts.get("nested")
    if nopts:
        path = str(nopts["path"])
        if not fname.startswith(path + "."):
            raise ValueError(
                f"sort field {fname!r} is outside nested path {path!r}")
        arr = F.col(path)
        if nopts.get("filter") is not None:
            inner = compile_query(nopts["filter"], text_field)
            arr = F.filter(arr,
                           lambda e: element_pred(inner, path, e))
        rel = [s for s in fname[len(path) + 1:].split(".") if s]
        vals = F.transform(
            arr, lambda e: reduce(lambda c, s: c[s], rel, e))
    else:
        vals = F.col(fname)
    vals = F.filter(vals, lambda v: v.isNotNull())
    n = F.size(vals)
    mode = str(opts.get("mode") or (
        "max" if str(opts.get("order", "asc")).lower() == "desc"
        else "min"))
    if mode == "min":
        # element type preserved: min/max order strings lexically
        # (MultiValueMode supports keyword fields); only the numeric
        # folds cast
        out = F.array_min(vals)
    elif mode == "max":
        out = F.array_max(vals)
    elif mode in ("sum", "avg"):
        vals = F.transform(vals, lambda v: v.cast("double"))
        out = F.aggregate(vals, F.lit(0.0), lambda a, v: a + v)
        if mode == "avg":
            out = out / n
    elif mode == "median":
        s = F.array_sort(F.transform(vals, lambda v: v.cast("double")))
        mid = ((n + 1) / 2).cast("int")
        lo = F.element_at(s, mid)
        hi = F.element_at(
            s, F.when(n % 2 == 0, mid + 1).otherwise(mid))
        out = (lo + hi) / 2
    else:
        raise ValueError(f"unsupported sort mode {mode!r}")
    return F.when(n > 0, out)


def _sort_spec(sort_list: list,
               text_field: str = DEFAULT_TEXT_FIELD
               ) -> list[tuple[Column, bool, bool]]:
    """OpenSearch ``sort`` entries -> [(column, is_desc,
    nulls_first)] (``_score`` maps to the score column; default is
    score desc; ``_script`` sorts by a restricted-Painless expression
    over docs columns; ``_geo_distance`` by haversine distance to a
    reference point — a map-side expression, never a join; a
    ``mode`` / ``nested`` options block reduces multi-valued fields
    per doc).

    ``missing`` follows the wire contract: the DEFAULT is ``_last``
    in BOTH directions (upstream sorts absent values after present
    ones — Spark's asc() NULLS FIRST default would silently front-run
    every page with the null docs); ``_first`` flips it; any other
    value substitutes a literal for missing docs (coalesce)."""
    spec = []
    for s in sort_list:
        if isinstance(s, str):
            fname, opts = s, {}
        else:
            fname, opts = _one(s)
        if fname == "_geo_distance":
            from ..operators.geo import haversine_km

            o = dict(opts)
            direction = str(o.pop("order", "asc")).lower()
            unit = str(o.pop("unit", "m")).lower()
            o.pop("mode", None)
            o.pop("distance_type", None)
            (gfield, point), = o.items()
            if isinstance(point, dict):
                qlat, qlon = float(point["lat"]), float(point["lon"])
            elif isinstance(point, (list, tuple)):  # GeoJSON lon,lat
                qlon, qlat = float(point[0]), float(point[1])
            else:  # "lat,lon" string
                a, b = str(point).split(",")
                qlat, qlon = float(a), float(b)
            scale = {"m": 1000.0, "km": 1.0, "mi": 1.0 / 1.609344,
                     "ft": 3280.839895}.get(unit)
            if scale is None:
                raise ValueError(f"unsupported geo sort unit {unit!r}")
            col = haversine_km(F.col(gfield + ".lat"),
                               F.col(gfield + ".lon"),
                               qlat, qlon) * F.lit(scale)
            spec.append((col, direction == "desc", False))
            continue
        # _score defaults desc, fields default asc (OpenSearch)
        default = "desc" if fname == "_score" else "asc"
        direction = (opts.get("order", default)
                     if isinstance(opts, dict) else str(opts))
        if fname == "_script":
            from .painless import parse_script, to_column
            src = opts["script"]
            src = src["source"] if isinstance(src, dict) else str(src)
            col = to_column(parse_script(src))
        elif isinstance(opts, dict) and ("nested" in opts
                                         or "mode" in opts):
            col = _multi_value_sort_col(fname, opts, text_field)
        else:
            col = F.col("score" if fname == "_score" else fname)
        nulls_first = False        # the wire's missing: _last default
        missing = (opts.get("missing")
                   if isinstance(opts, dict) else None)
        if missing == "_first":
            nulls_first = True
        elif missing is not None and missing != "_last":
            col = F.coalesce(col, F.lit(missing))
        spec.append((col, direction == "desc", nulls_first))
    if not spec:
        spec = [(F.col("score"), True, False)]
    return spec


def _ordered(spec: list[tuple[Column, bool, bool]]) -> list[Column]:
    """Spec -> orderBy columns with explicit null placement (Spark's
    asc() NULLS FIRST default never leaks through)."""
    out = []
    for c, d, nf in spec:
        if d:
            out.append(c.desc_nulls_first() if nf
                       else c.desc_nulls_last())
        else:
            out.append(c.asc_nulls_first() if nf
                       else c.asc_nulls_last())
    return out


def _order_cols(sort_list: list,
                text_field: str = DEFAULT_TEXT_FIELD) -> list[Column]:
    return _ordered(_sort_spec(sort_list, text_field))


def _after_pred(spec: list[tuple[Column, bool]],
                after: list) -> Column:
    """search_after cursor: rows strictly AFTER the cursor tuple in
    the sort order, as one lexicographic predicate (pushable into the
    scan when the leading sort column is the partition/sort key)."""
    if len(after) != len(spec):
        raise ValueError(
            f"search_after needs {len(spec)} values (one per sort "
            f"key incl. the doc_id tiebreak); got {len(after)}"
        )
    pred = F.lit(False)
    for i in range(len(spec) - 1, -1, -1):
        col, is_desc, nf = spec[i][0], spec[i][1], spec[i][2]
        v = after[i]
        if v is None:
            # cursor already inside the missing band: with nulls
            # last nothing sorts after it at this level; with nulls
            # first every present value does
            strict = col.isNotNull() if nf else F.lit(False)
            eq = col.isNull()
        else:
            lit = F.lit(v)
            base = (col < lit) if is_desc else (col > lit)
            # missing docs sort after any present cursor value unless
            # the entry asked for nulls first — without this, NULL
            # comparisons silently drop the whole missing tail from
            # every cursor page
            strict = (F.coalesce(base, F.lit(False))
                      | (col.isNull() & F.lit(not nf)))
            eq = F.coalesce(col == lit, F.lit(False))
        pred = strict | (eq & pred)
    return pred


def _sparse_scored(ix: PostingsIndex, qnode: dict,
                   sparse) -> DataFrame:
    """Top-level ``neural_sparse`` query -> (docs cols..., score):
    token-weight dot product over the weighted-postings index
    (``index/sparse.py``) — the same pushed-scan/one-groupBy plan as
    BM25; optional ``two_phase`` block routes through the 2.15
    two-phase processor semantics."""
    from .sparse import neural_sparse_topk, neural_sparse_topk_two_phase

    _, params = _one(qnode)
    field, spec = _one(params)
    if sparse is None:
        raise ValueError("neural_sparse query needs the sparse index "
                         "(sparse=...)")
    if field != sparse.field:
        raise ValueError(
            f"neural_sparse targets the rank_features field "
            f"{sparse.field!r}; got {field!r}")
    toks = {t: float(w) for t, w in spec["query_tokens"].items()}
    k = int(spec.get("k", 10))
    two = spec.get("two_phase")
    if two:
        top = neural_sparse_topk_two_phase(
            sparse, toks, k=k,
            prune_ratio=float(two.get("prune_ratio", 0.4)),
            expand=int(two.get("expand", 5)))
    else:
        top = neural_sparse_topk(sparse, toks, k=k)
    return top.join(ix.docs, "doc_id", "left").select(
        *[c for c in ix.docs.columns], "score")


def _multi_scored(ix: PostingsIndex, qkind: str, params: dict,
                  multi_ix) -> DataFrame:
    """Top-level ``multi_match`` / ``combined_fields`` body query over
    a MultiFieldIndex (pass ``multi_ix=``).  ``fields`` entries take
    the wire ``name^boost`` form; multi_match ``type`` selects
    best_fields (default) / most_fields / cross_fields, with
    ``tie_breaker``; ``combined_fields`` is the BM25F scorer
    (index/multifield.py)."""
    from .multifield import combined_fields_scores, multi_match_scores

    if multi_ix is None:
        raise ValueError(f"{qkind} queries need the multi-field index "
                         "(multi_ix=...)")
    import fnmatch

    indexed = [f for f in multi_ix.field_stats if f != "*"]
    boosts: dict[str, float] = {}
    for f in params.get("fields", []):
        name, _, b = str(f).partition("^")
        w = float(b) if b else 1.0
        # wire field patterns ("*", "user.*") expand against the
        # indexed fields; exact names pass through even if unknown
        # (scoring skips them, like an unmapped field)
        targets = (fnmatch.filter(indexed, name) if "*" in name
                   else [name])
        for t in targets:
            boosts[t] = w
    if not boosts:
        raise ValueError(f"{qkind} needs a non-empty 'fields' list")
    query = str(params.get("query", ""))
    if qkind == "combined_fields":
        scores = combined_fields_scores(
            multi_ix, query, boosts,
            operator=str(params.get("operator", "or")),
            minimum_should_match=int(
                params.get("minimum_should_match", 0)))
    else:
        mtype = str(params.get("type", "best_fields"))
        if mtype == "combined_fields":
            scores = combined_fields_scores(multi_ix, query, boosts)
        else:
            scores = multi_match_scores(
                multi_ix, query, boosts, mode=mtype,
                tie_breaker=float(params.get("tie_breaker", 0.0)))
    return scores.join(ix.docs, "doc_id", "left").select(
        *[c for c in ix.docs.columns], "score")


def _vector_scored(
    ix: PostingsIndex,
    qnode: dict,
    positional_ix: PostingsIndex | None,
    text_field: str,
    vecs: DataFrame | None,
    vec_id_col: str,
    vec_col: str,
    sparse=None,
) -> DataFrame:
    """knn / hybrid top-level queries -> (docs cols..., score).

    knn: brute-force cosine over the embeddings table (the exact
    baseline; swap in ivf_topk_materialized for the nprobe-pruned
    scale path), with the optional ``filter`` applied BEFORE the
    top-k cut (OpenSearch post-filter-free pre-filtering semantics).
    hybrid: each sub-query ranked to pagination_depth, RRF-fused --
    fusion inputs are depth-bounded, so it is metadata-sized work.
    """
    from ..operators.hybrid import _ranked, rrf_fuse
    from ..operators.similarity import cosine_topk

    kind, params = _one(qnode)
    if kind == "knn":
        field, spec = _one(params)
        if vecs is None and (spec.get("method") or {}).get("name") \
                not in ("hnsw", "ivf"):
            raise ValueError(f"{kind} query needs the embeddings "
                             "table (vecs=...)")
        if field != vec_col:
            raise ValueError(
                f"knn targets the embeddings column {vec_col!r}; "
                f"got {field!r}"
            )
        radial = ("min_score" in spec) or ("max_distance" in spec)
        if radial and "k" in spec:
            raise ValueError("knn takes k OR min_score/max_distance, "
                             "not both (plugin radial-search contract)")
        k = int(spec.get("k", 10))
        method = spec.get("method") or {}
        if radial:
            # radial search: a map-side score filter over the
            # (optionally pre-filtered) scan — no top-k heap at all.
            from ..operators.similarity import cosine_radial

            cand = vecs
            if "filter" in spec:
                pred = _filter_pred(spec["filter"], text_field,
                                    frame=ix.docs)
                keep = ix.docs.filter(pred).select(
                    F.col("doc_id").alias(vec_id_col))
                cand = vecs.join(keep, vec_id_col, "left_semi")
            top = cosine_radial(
                cand, spec["vector"],
                min_score=spec.get("min_score"),
                max_distance=spec.get("max_distance"),
                id_col=vec_id_col, vec_col=vec_col)
        elif method.get("name") == "ivf" and "filter" not in spec:
            # IVF path: the method block carries the materialized
            # partitionBy(cell) layout path + centroid table (the
            # mapping's FAISS-IVF method analog); probing is literal
            # `cell IN` directory pruning, never a full scan.
            from ..operators.similarity import ivf_topk_materialized

            top = ivf_topk_materialized(
                ix.docs.sparkSession, method["path"],
                method["centroids"], spec["vector"], k=k,
                nprobe=int(method.get("nprobe", 4)),
            ).select(F.col("vec_id").alias(vec_id_col), "cosine")
        elif method.get("name") == "hnsw" and "filter" not in spec:
            # graph ANN path: the method block carries the prebuilt
            # sharded HNSW graph (the mapping's method analog). A
            # filtered knn falls back to the exact pre-filtered scan
            # below — the same exact-search fallback upstream takes
            # when the filter is restrictive.
            from ..operators.hnsw import hnsw_query

            ef = int(method.get("ef_search", max(64, k)))
            top = hnsw_query(method["graph"], [(0, spec["vector"])],
                             k=k, ef_search=ef) \
                .select(F.col("vec_id").alias(vec_id_col), "cosine")
        else:
            cand = vecs
            if "filter" in spec:
                pred = _filter_pred(spec["filter"], text_field,
                                    frame=ix.docs)
                keep = ix.docs.filter(pred).select(
                    F.col("doc_id").alias(vec_id_col))
                cand = vecs.join(keep, vec_id_col, "left_semi")
            top = cosine_topk(cand, spec["vector"], k=k,
                              id_col=vec_id_col, vec_col=vec_col)
        scored = top.select(
            F.col(vec_id_col).alias("doc_id"),
            F.col("cosine").cast("double").alias("score"),
        )
        return scored.join(ix.docs, "doc_id", "left").select(
            *[c for c in ix.docs.columns], "score")

    # hybrid: sub-queries cut to pagination_depth, then fused either
    # by RRF (rank_constant; the score-ranker processor) or by the
    # normalization processor (the 2.x default pipeline) when the
    # body carries "normalization"/"combination" blocks.
    depth = int(params.get("pagination_depth", 50))
    rank_const = int(params.get("rank_constant", 60))
    cuts = []
    for sub in params.get("queries", []):
        skind, _ = _one(sub)
        if skind in ("knn", "neural_sparse"):
            if skind == "knn":
                sub_scored = _vector_scored(ix, sub, positional_ix,
                                            text_field, vecs, vec_id_col,
                                            vec_col)
            else:
                sub_scored = _sparse_scored(ix, sub, sparse)
            cut = (sub_scored.select("doc_id", "score")
                   .orderBy(F.desc("score"), F.asc("doc_id"))
                   .limit(depth))
        else:
            tree = compile_query(sub, text_field)
            sub_scored = tree_scores(ix, tree,
                                     positional_ix=positional_ix)
            if sub_scored is None:
                continue
            cut = (sub_scored.orderBy(F.desc("score"), F.asc("doc_id"))
                   .limit(depth))
        cuts.append(cut)
    if not cuts:
        raise ValueError("hybrid query needs at least one sub-query")
    if "normalization" in params or "combination" in params:
        from ..operators.hybrid import normalized_fuse

        comb = params.get("combination", {})
        fused = normalized_fuse(
            cuts, k=depth,
            normalization=params.get(
                "normalization", {}).get("technique", "min_max"),
            combination=comb.get("technique", "arithmetic_mean"),
            weights=comb.get("parameters", {}).get("weights"),
        )
    else:
        fused = rrf_fuse(
            [_ranked(c, "doc_id", "score") for c in cuts],
            k=depth, rank_const=rank_const,
        ).withColumnRenamed("rrf_score", "score")
    return fused.select("doc_id", "score").join(
        ix.docs, "doc_id", "left"
    ).select(*[c for c in ix.docs.columns], "score")


# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------

_BUCKET_KINDS = ("terms", "date_histogram", "auto_date_histogram",
                 "histogram", "range", "filters", "multi_terms",
                 "date_range", "ip_range", "adjacency_matrix",
                 "variable_width_histogram",
                 "geohash_grid", "geotile_grid", "geohex_grid",
                 "geo_distance")
_METRIC_KINDS = ("avg", "sum", "min", "max", "value_count",
                 "cardinality", "stats", "percentiles",
                 "percentile_ranks", "string_stats",
                 "median_absolute_deviation", "boxplot",
                 "matrix_stats", "geo_line", "reverse_nested",
                 "weighted_avg", "extended_stats", "scripted_metric",
                 "rate", "geo_bounds", "geo_centroid", "top_metrics")

#: fixed-width intervals the ``rate`` metric can normalize between;
#: month/quarter/year buckets vary in length and are rejected (the
#: upstream agg handles those by per-bucket day counts -- out of
#: scope until a workload needs it)
_FIXED_SECONDS = {"second": 1, "minute": 60, "hour": 3600,
                  "day": 86400, "week": 604800}


def _interval_seconds(interval: str) -> float:
    if interval in _FIXED_SECONDS:
        return float(_FIXED_SECONDS[interval])
    unit = interval[-1]
    if interval[:-1].isdigit() and unit in "smhdw":
        return float(int(interval[:-1])) * {
            "s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}[unit]
    raise ValueError(
        f"rate cannot normalize over interval {interval!r} "
        "(variable-width calendar buckets)")


def _rate_expr(name: str, params: dict, levels: list[tuple],
               bucket_meta: dict) -> Column:
    """The ``rate`` metric: per-bucket value scaled from the parent
    date_histogram's width to the requested unit
    (``sum(field) * unit_seconds / bucket_seconds``; doc count when
    no field). Pure arithmetic over the same single aggregation."""
    parent = None
    for lvl_name, _k, _e, _p in reversed(levels):
        meta = bucket_meta.get(lvl_name)
        if meta and meta[0] == "date_histogram":
            parent = meta[1]
            break
    if parent is None:
        raise ValueError("rate needs an enclosing date_histogram")
    interval = parent.get("calendar_interval",
                          parent.get("fixed_interval", "day"))
    bucket_s = _interval_seconds(str(interval))
    unit = params.get("unit")
    unit_s = bucket_s if unit is None else _interval_seconds(str(unit))
    base = (F.sum(F.col(params["field"]).cast("double"))
            if "field" in params else F.count(F.lit(1)).cast("double"))
    return (base * F.lit(unit_s / bucket_s)).alias(name)

_CAL_TRUNC = {"second": "second", "minute": "minute", "hour": "hour",
              "day": "day", "week": "week", "month": "month",
              "quarter": "quarter", "year": "year",
              "1s": "second", "1m": "minute", "1h": "hour", "1d": "day",
              "1w": "week", "1M": "month", "1q": "quarter", "1y": "year"}


def _dur_secs(s: str) -> int:
    """'+6h' / '-30m' / '90s' / '1d' -> signed seconds (the wire's
    fixed-duration grammar; ms and calendar units are rejected)."""
    s = str(s).strip()
    sign = -1 if s.startswith("-") else 1
    s = s.lstrip("+-")
    unit = s[-1]
    if unit not in ("s", "m", "h", "d"):
        raise ValueError(f"unsupported duration unit in {s!r}")
    return sign * int(s[:-1]) * {"s": 1, "m": 60, "h": 3600,
                                 "d": 86400}[unit]


#: ladder cap for min_doc_count:0 filling -- the wire's
#: search.max_buckets analog (a mis-sized interval over a wide range
#: must error, not OOM the driver)
_MAX_FILLED_BUCKETS = 10_000


def _fill_empty_buckets(g: DataFrame, name: str, kind: str,
                        params: dict, metrics: list[tuple]) -> DataFrame:
    """Left-join the full bucket ladder into a single-level
    (date_)histogram frame: absent rungs get doc_count 0 (sum /
    value_count metrics coalesce to 0 like the wire; other metrics
    stay null). Bounds = extended_bounds if given (snapped to the
    grid), else the observed key range."""
    import datetime as dt

    spark = g.sparkSession
    row = g.agg(F.min(name).alias("lo"), F.max(name).alias("hi")) \
        .collect()[0]
    lo, hi = row["lo"], row["hi"]
    eb = params.get("extended_bounds") or {}

    if kind == "histogram":
        step = float(params["interval"])

        def snap(v):
            import math
            return math.floor(float(v) / step) * step

        if eb.get("min") is not None:
            lo = snap(eb["min"]) if lo is None else min(lo, snap(eb["min"]))
        if eb.get("max") is not None:
            hi = snap(eb["max"]) if hi is None else max(hi, snap(eb["max"]))
        if lo is None:
            return g
        n = int(round((hi - lo) / step)) + 1
        if n > _MAX_FILLED_BUCKETS:
            raise ValueError(
                f"min_doc_count:0 would fill {n} buckets "
                f"(cap {_MAX_FILLED_BUCKETS}) -- widen the interval")
        keys = [(lo + i * step,) for i in range(n)]
        ladder = spark.createDataFrame(keys, f"{name} double")
    else:
        interval = params.get("calendar_interval",
                              params.get("fixed_interval", "day"))
        tzname = params.get("time_zone")
        off = _dur_secs(params["offset"]) if params.get("offset") else 0

        def parse_bound(v):
            if isinstance(v, (int, float)):  # epoch millis
                return dt.datetime.utcfromtimestamp(float(v) / 1000.0)
            return dt.datetime.fromisoformat(str(v))

        def snap_ts(t: dt.datetime) -> dt.datetime:
            # same composition as the scan-side bucket expr: to local,
            # minus offset, truncate, plus offset, back to UTC
            if tzname:
                from zoneinfo import ZoneInfo
                t = t.replace(tzinfo=dt.timezone.utc).astimezone(
                    ZoneInfo(tzname)).replace(tzinfo=None)
            t = t - dt.timedelta(seconds=off)
            unit = _CAL_TRUNC.get(interval)
            if unit == "second":
                t = t.replace(microsecond=0)
            elif unit == "minute":
                t = t.replace(second=0, microsecond=0)
            elif unit == "hour":
                t = t.replace(minute=0, second=0, microsecond=0)
            elif unit == "day":
                t = t.replace(hour=0, minute=0, second=0, microsecond=0)
            elif unit == "week":
                t = t.replace(hour=0, minute=0, second=0, microsecond=0)
                t -= dt.timedelta(days=t.weekday())
            elif unit == "month":
                t = t.replace(day=1, hour=0, minute=0, second=0,
                              microsecond=0)
            elif unit == "quarter":
                t = t.replace(month=t.month - (t.month - 1) % 3, day=1,
                              hour=0, minute=0, second=0, microsecond=0)
            elif unit == "year":
                t = t.replace(month=1, day=1, hour=0, minute=0,
                              second=0, microsecond=0)
            else:  # fixed interval
                secs = _dur_secs(interval)
                e = int(t.replace(tzinfo=dt.timezone.utc).timestamp())
                t = dt.datetime.utcfromtimestamp(e // secs * secs)
            t = t + dt.timedelta(seconds=off)
            if tzname:
                from zoneinfo import ZoneInfo
                t = t.replace(tzinfo=ZoneInfo(tzname)).astimezone(
                    dt.timezone.utc).replace(tzinfo=None)
            return t

        def step_local(t: dt.datetime) -> dt.datetime:
            unit = _CAL_TRUNC.get(interval)
            if unit == "month":
                y, m = divmod(t.month, 12)
                return t.replace(year=t.year + y, month=m + 1)
            if unit == "quarter":
                m0 = t.month + 2
                return t.replace(year=t.year + m0 // 12,
                                 month=m0 % 12 + 1)
            if unit == "year":
                return t.replace(year=t.year + 1)
            if unit == "week":
                return t + dt.timedelta(days=7)
            if unit == "day":
                return t + dt.timedelta(days=1)
            if unit == "hour":
                return t + dt.timedelta(hours=1)
            if unit == "minute":
                return t + dt.timedelta(minutes=1)
            if unit == "second":
                return t + dt.timedelta(seconds=1)
            return t + dt.timedelta(seconds=_dur_secs(interval))

        def to_local(t: dt.datetime) -> dt.datetime:
            if not tzname:
                return t
            from zoneinfo import ZoneInfo
            return t.replace(tzinfo=dt.timezone.utc).astimezone(
                ZoneInfo(tzname)).replace(tzinfo=None)

        def to_utc(t: dt.datetime) -> dt.datetime:
            if not tzname:
                return t
            from zoneinfo import ZoneInfo
            return t.replace(tzinfo=ZoneInfo(tzname)).astimezone(
                dt.timezone.utc).replace(tzinfo=None)

        if eb.get("min") is not None:
            b = snap_ts(parse_bound(eb["min"]))
            lo = b if lo is None else min(lo, b)
        if eb.get("max") is not None:
            b = snap_ts(parse_bound(eb["max"]))
            hi = b if hi is None else max(hi, b)
        if lo is None:
            return g
        # step in LOCAL bucket space (calendar units stay calendar
        # across DST), emit UTC instants like the scan-side keys
        keys = []
        cur = to_local(lo)
        end = to_local(hi)
        while cur <= end:
            keys.append((to_utc(cur),))
            if len(keys) > _MAX_FILLED_BUCKETS:
                raise ValueError(
                    f"min_doc_count:0 would fill >{_MAX_FILLED_BUCKETS} "
                    "buckets -- widen the interval")
            cur = step_local(cur)
        ladder = spark.createDataFrame(keys, f"{name} timestamp")

    zero_metrics = [mn for mn, mk, _mp in metrics
                    if mk in ("sum", "value_count")]
    joined = ladder.join(g, name, "left")
    joined = joined.withColumn(
        "doc_count", F.coalesce(F.col("doc_count"), F.lit(0)))
    for mn in zero_metrics:
        if mn in joined.columns:
            joined = joined.withColumn(
                mn, F.coalesce(F.col(mn), F.lit(0.0)))
    return joined.select(*g.columns)


def _bucket_expr(kind: str, params: dict, text_field: str,
                 df: DataFrame | None = None
                 ) -> tuple[Column, bool, dict | None]:
    """-> (key expr, needs_explode, terms prune spec or None).

    terms supports the dashboards' stored params: ``size``,
    ``missing`` (null-key replacement bucket), and ``order`` by
    ``_count`` (default) / ``_key`` / a sibling metric name (the
    visState ``orderBy: "<metric id>"`` shape)."""
    if kind == "terms":
        key = F.col(params["field"]).cast("string")
        if "missing" in params:
            key = F.coalesce(key, F.lit(str(params["missing"])))
        # include / exclude: regex (RE2-anchored, Lucene semantics:
        # the WHOLE key must match) or explicit value list; the
        # partitioned form {"partition": p, "num_partitions": n}
        # pages a high-cardinality keyset by key hash — all native
        # predicates folded into the same key expression, so the
        # groupBy only ever sees surviving keys
        inc = params.get("include")
        if isinstance(inc, dict):
            n = int(inc["num_partitions"])
            p = int(inc["partition"])
            key = F.when(
                F.pmod(F.xxhash64(key), F.lit(n)) == F.lit(p), key)
        elif isinstance(inc, (list, tuple)):
            key = F.when(key.isin([str(x) for x in inc]), key)
        elif inc is not None:
            key = F.when(key.rlike(f"^(?:{inc})$"), key)
        exc = params.get("exclude")
        if isinstance(exc, (list, tuple)):
            key = F.when(key.isin([str(x) for x in exc]), None) \
                .otherwise(key)
        elif exc is not None:
            key = F.when(key.rlike(f"^(?:{exc})$"), None).otherwise(key)
        order = params.get("order", {"_count": "desc"})
        if isinstance(order, list):
            order = order[0]
        by, dirn = next(iter(order.items()))
        return key, False, {"size": int(params.get("size", 10)),
                            "by": by, "dir": str(dirn).lower()}
    if kind == "date_histogram":
        interval = params.get("calendar_interval",
                              params.get("fixed_interval", "day"))
        col = F.col(params["field"])
        tz = params.get("time_zone")
        off = _dur_secs(params["offset"]) if params.get("offset") else 0
        base = F.from_utc_timestamp(col, tz) if tz else col
        if off:
            base = base - F.make_interval(secs=F.lit(off))
        if interval in _CAL_TRUNC:
            key = F.date_trunc(_CAL_TRUNC[interval], base)
        else:  # fixed_interval like "30m" / "6h" / "90s"
            secs = _dur_secs(interval)
            epoch = base.cast("timestamp").cast("long")
            key = F.timestamp_seconds((epoch / secs).cast("long") * secs)
        if off:
            key = key + F.make_interval(secs=F.lit(off))
        if tz:
            # back to the UTC instant of the local bucket start (the
            # wire returns epoch-millis keys in UTC)
            key = F.to_utc_timestamp(key, tz)
        return key, False, None
    if kind == "auto_date_histogram":
        # interval rung chosen from the data span: a 1-row min/max
        # probe (two longs to the driver at any corpus size), then the
        # rung compiles into the ordinary scan-side bucket expression
        # (operators/aggs.py auto_date_histogram, same rounding ladder)
        from ..operators.aggs import _AUTO_FIXED, choose_auto_interval

        ts = F.col(params["field"])
        row = df.agg(F.min(ts).alias("lo"),
                     F.max(ts).alias("hi")).collect()[0]
        if row["lo"] is None:
            return F.lit(None).cast("timestamp"), False, None
        span = (row["hi"] - row["lo"]).total_seconds()
        label = choose_auto_interval(span, int(params.get("buckets", 10)))
        fixed = dict(_AUTO_FIXED)
        if label in fixed:
            secs = fixed[label]
            key = F.timestamp_seconds(
                F.floor(F.unix_timestamp(ts) / secs) * secs)
        elif label == "1M":
            key = F.date_trunc("month", ts)
        elif label == "3M":
            m = F.date_trunc("month", ts)
            key = F.add_months(m, -(F.month(m) - 1) % 3)
        else:
            key = F.date_trunc("year", ts)
        return key, False, None
    if kind == "histogram":
        step = float(params["interval"])
        v = F.col(params["field"]).cast("double")
        return F.floor(v / step) * step, False, None
    if kind == "range":
        v = F.col(params["field"]).cast("double")
        arms = []
        for r in params["ranges"]:
            frm, to = r.get("from"), r.get("to")
            label = r.get("key", f"{frm if frm is not None else '*'}-"
                                 f"{to if to is not None else '*'}")
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (v >= float(frm))
            if to is not None:
                cond = cond & (v < float(to))
            arms.append(F.when(cond, F.lit(label)))
        # overlapping ranges are legal: emit an ARRAY of matched arm
        # labels and explode (a doc lands in every matching bucket)
        arr = F.array_compact(F.array(*arms))
        return arr, True, None
    if kind == "filters":
        arms = []
        for label, q in params["filters"].items():
            pred = _filter_pred(q, text_field, frame=df)
            arms.append(F.when(pred, F.lit(label)))
        return F.array_compact(F.array(*arms)), True, None
    if kind == "adjacency_matrix":
        # named filters -> one bucket per filter plus one per
        # intersecting PAIR ("a&b", keys in sorted order, as
        # upstream).  Same array+explode shape as `filters`: every
        # arm is a native predicate evaluated once per doc, one
        # groupBy carries singles and pairs together.  Arm count is
        # n + n(n-1)/2 -- query metadata, bounded by the upstream
        # 100-filter cap.
        sep = str(params.get("separator", "&"))
        preds = {str(label): _filter_pred(q, text_field,
                                          frame=df)
                 for label, q in params["filters"].items()}
        if len(preds) > 100:
            raise ValueError("adjacency_matrix: >100 filters")
        labels = sorted(preds)
        arms = [F.when(preds[l], F.lit(l)) for l in labels]
        for i, a in enumerate(labels):
            for b in labels[i + 1:]:
                arms.append(F.when(preds[a] & preds[b],
                                   F.lit(f"{a}{sep}{b}")))
        return F.array_compact(F.array(*arms)), True, None
    if kind == "variable_width_histogram":
        # upstream is an order-dependent approximate 1-D clustering
        # (collector-phase nearest-centroid merge); the deterministic
        # Spark-first restatement is equal-depth bucketing: a driver
        # probe computes exact (buckets-1) interpolated split points
        # -- one tiny agg job, metadata-sized like the
        # auto_date_histogram min/max probe -- and the key expression
        # is a closed-form split-point fold, so the scan side stays
        # one ordinary hash agg.  Bucket key = ordinal; add min/max/
        # avg sub-metrics for the wire's per-bucket bounds.
        n = int(params.get("buckets", 10))
        fld = params["field"]
        vv = F.col(fld).cast("double")
        qs = ",".join(str(i / n) for i in range(1, n))
        splits: list[float] = []
        if n > 1 and df is not None:
            row = df.agg(F.expr(
                f"percentile({fld}, array({qs}))").alias("sp")).collect()[0]
            if row["sp"] is not None:
                seen = set()
                for s in row["sp"]:
                    if s is not None and s not in seen:
                        seen.add(s)
                        splits.append(float(s))
        key = F.lit(0)
        for s in splits:
            key = key + F.when(vv > F.lit(s), 1).otherwise(0)
        return F.when(vv.isNotNull(), key), False, None
    if kind == "multi_terms":
        # composite key over N fields; a doc missing ANY field drops
        # out of the agg (upstream multi_terms semantics) — the
        # null-key filter in _materialize handles that once the key
        # is gated on all parts being present
        fields = [t["field"] for t in params["terms"]]
        present = reduce(Column.__and__,
                         [F.col(f).isNotNull() for f in fields])
        key = F.when(present, F.concat_ws(
            "|", *[F.col(f).cast("string") for f in fields]))
        order = params.get("order", {"_count": "desc"})
        if isinstance(order, list):
            order = order[0]
        by, dirn = next(iter(order.items()))
        return key, False, {"size": int(params.get("size", 10)),
                            "by": by, "dir": str(dirn).lower()}
    if kind == "date_range":
        v = F.col(params["field"]).cast("timestamp")
        arms = []
        for r in params["ranges"]:
            frm, to = r.get("from"), r.get("to")
            label = r.get("key", f"{frm if frm is not None else '*'}-"
                                 f"{to if to is not None else '*'}")
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (v >= F.lit(str(frm)).cast("timestamp"))
            if to is not None:
                cond = cond & (v < F.lit(str(to)).cast("timestamp"))
            arms.append(F.when(cond, F.lit(label)))
        return F.array_compact(F.array(*arms)), True, None
    if kind == "ip_range":
        # bounds and CIDR masks resolve to uint32 intervals on the
        # driver (query metadata); the scan-side predicate is pure
        # integer arithmetic over the shared ipv4 encoding
        from ..functions.scalars import ipv4_to_long
        from ..operators.aggs import _cidr_bounds

        ipl = ipv4_to_long(F.col(params["field"]))
        arms = []
        for r in params["ranges"]:
            if "mask" in r:
                lo, hi = _cidr_bounds(r["mask"])
                label = r.get("key", r["mask"])
            else:
                frm, to = r.get("from"), r.get("to")
                lo = None if frm is None else _cidr_bounds(
                    str(frm) + "/32")[0]
                hi = None if to is None else _cidr_bounds(
                    str(to) + "/32")[0]
                label = r.get("key",
                              f"{frm if frm is not None else '*'}-"
                              f"{to if to is not None else '*'}")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (ipl >= F.lit(lo))
            if hi is not None:
                cond = cond & (ipl < F.lit(hi))
            arms.append(F.when(cond, F.lit(label)))
        return F.array_compact(F.array(*arms)), True, None
    # geo grids: the dashboards' coordinate-map rollups. The geo_point
    # field is a struct column with lat/lon doubles; the cell key is
    # closed-form native arithmetic (operators/geo.py, operators/
    # aggs.py), so a grid agg costs exactly a terms agg.
    if kind == "geohash_grid":
        from ..operators.geo import geohash

        f = params["field"]
        key = geohash(f"{f}.lat", f"{f}.lon",
                      int(params.get("precision", 5)))
        return key, False, {"size": int(params.get("size", 10000)),
                            "by": "_count", "dir": "desc"}
    if kind == "geotile_grid":
        from ..operators.aggs import geotile

        f = params["field"]
        key = geotile(F.col(f"{f}.lat"), F.col(f"{f}.lon"),
                      int(params.get("precision", 7)))
        return key, False, {"size": int(params.get("size", 10000)),
                            "by": "_count", "dir": "desc"}
    if kind == "geohex_grid":
        from ..operators.geo import geohex

        f = params["field"]
        key = geohex(f"{f}.lat", f"{f}.lon",
                     int(params.get("precision", 4)))
        return key, False, {"size": int(params.get("size", 10000)),
                            "by": "_count", "dir": "desc"}
    if kind == "geo_distance":
        from ..operators.geo import haversine_km

        f, origin = params["field"], params["origin"]
        unit_km = {"m": 1e-3, "km": 1.0, "mi": 1.609344,
                   "ft": 0.0003048}[params.get("unit", "m")]
        dist = haversine_km(
            F.col(f"{f}.lat").cast("double"),
            F.col(f"{f}.lon").cast("double"),
            float(origin["lat"]), float(origin["lon"]))
        arms = []
        for r in params["ranges"]:
            frm, to = r.get("from"), r.get("to")
            label = r.get("key", f"{frm if frm is not None else '*'}-"
                                 f"{to if to is not None else '*'}")
            cond = F.lit(True)
            if frm is not None:
                cond = cond & (dist >= float(frm) * unit_km)
            if to is not None:
                cond = cond & (dist < float(to) * unit_km)
            arms.append(F.when(cond, F.lit(label)))
        return F.array_compact(F.array(*arms)), True, None
    raise ValueError(f"unsupported bucket agg {kind!r}")


def _filter_pred(q: dict | str, text_field: str,
                 frame: DataFrame | None = None) -> Column:
    """Docs-column predicate for a filters-agg arm.  Term-level nodes
    only (the agg input already passed the top-level query).  A plain
    string arm is a query_string -- the shape the reference dashboards
    actually store (saved_objects/each-dashboard/guardduty.ndjson
    visState filters: {"input": {"query": "severitylabel:high",
    "language": "kuery"}}).  Pass ``frame`` (the DataFrame the
    predicate will filter) so flat_object (map-typed) fields resolve;
    without it, dotted paths resolve as struct columns only."""
    from .querystring import _Compiler, map_typed_cols

    node = (parse_query_string(q) if isinstance(q, str)
            else compile_query(q, text_field))
    leaves: list = []
    from .querystring import _walk
    _walk(node, leaves)
    if any(isinstance(l, TermLeaf) for l in leaves):
        raise ValueError(
            "filters-agg arms must be term-level (docs-column) queries"
        )
    comp = _Compiler(
        F.array().cast("array<struct<leaf:int,contrib:double>>"),
        flat_cols=(map_typed_cols(frame.schema)
                   if frame is not None else frozenset()))
    return comp.matched(node)


_MAP_SCRIPT_RE = re.compile(
    r"^\s*state\.(\w+)\s*\+=\s*(.+?);?\s*$")
_COMBINE_RE = re.compile(r"^\s*return\s+state\.(\w+)\s*;?\s*$")
_INIT_RE = re.compile(r"^\s*state\.(\w+)\s*=\s*0(\.0)?\s*;?\s*$")


def _scripted_metric_parts(params: dict) -> tuple[str, str]:
    """Accept the canonical Painless shard-sum scripted_metric (init
    ``state.v = 0``, map ``state.v += <expr>``, combine ``return
    state.v``, reduce = sum over states) — which compiles to ONE
    native F.sum — or the explicit declarative form ``{"map_expr":
    <expr>, "reduce": sum|min|max|avg|count}``.  Anything else (a
    general interpreter would be a per-row Python UDF) is rejected
    with instructions."""
    if "map_expr" in params:
        return str(params["map_expr"]), str(params.get("reduce", "sum"))
    m = _MAP_SCRIPT_RE.match(str(params.get("map_script", "")))
    if not m:
        raise ValueError(
            "scripted_metric: supported forms are map_script "
            "'state.v += <expr>' (shard-sum) or the declarative "
            "{'map_expr': <expr>, 'reduce': sum|min|max|avg|count}")
    var, expr = m.group(1), m.group(2)
    init = params.get("init_script")
    if init is not None:
        im = _INIT_RE.match(str(init))
        if not im or im.group(1) != var:
            raise ValueError(
                "scripted_metric init_script must zero the map "
                "variable (a nonzero per-shard init sums "
                "shard-count-many times — not shard-agnostic)")
    comb = params.get("combine_script")
    if comb is not None:
        cm = _COMBINE_RE.match(str(comb))
        if not cm or cm.group(1) != var:
            raise ValueError(
                "scripted_metric combine_script must be "
                f"'return state.{var}'")
    return expr, "sum"


def _metric_exprs(name: str, kind: str, params: dict) -> list[Column]:
    if kind == "_hll_sketch":
        # hidden mergeable-cardinality state for the
        # cumulative_cardinality pipeline (never user-addressable)
        return [F.hll_sketch_agg(F.col(params["field"]).cast("string"))
                .alias(name)]
    if kind == "_vals_list":
        # hidden per-bucket value list for the moving_percentiles
        # pipeline (never user-addressable): collect_list skips
        # nulls, matching percentile()'s null handling
        return [F.collect_list(F.col(params["field"]).cast("double"))
                .alias(name)]
    if kind == "reverse_nested":
        # back to PARENT scope from a nested-agg element frame: the
        # bucket's doc_count counts unique parent docs (an element
        # frame repeats doc_id per element).  One distinct aggregate
        # in the SAME groupBy — no re-join to the parent table.
        # Sub-aggs under reverse_nested would need per-parent dedup
        # of metric inputs; the dashboards only read its doc_count.
        if params:
            raise ValueError(
                "reverse_nested supports the root form {} with no "
                "sub-aggs (doc_count = unique parents per bucket)")
        return [F.countDistinct(F.col("doc_id"))
                .alias(f"{name}_doc_count")]
    if kind == "scripted_metric":
        from .painless import parse_script, to_column
        src, red = _scripted_metric_parts(params)
        col = to_column(parse_script(src))
        fns = {"sum": F.sum, "min": F.min, "max": F.max,
               "avg": F.avg, "count": F.count}
        if red not in fns:
            raise ValueError(f"bad scripted_metric reduce {red!r}")
        return [fns[red](col).alias(name)]
    if kind == "top_metrics":
        # per-bucket metric values FROM the best row by the sort key:
        # native max_by/min_by — still one hash aggregate, no window,
        # no row materialization. size > 1 would need per-bucket row
        # lists; that is exactly the top_hits agg, rejected toward it.
        if int(params.get("size", 1)) != 1:
            raise ValueError("top_metrics supports size=1 "
                             "(use top_hits for ranked row lists)")
        sfield, sdir = _one(params["sort"]) if isinstance(
            params["sort"], dict) else (str(params["sort"]), "asc")
        if isinstance(sdir, dict):
            sdir = sdir.get("order", "asc")
        desc = str(sdir).lower() == "desc"
        sv = F.col(sfield).cast("double")
        # deterministic tie-break on doc_id asc (the engine-wide rule)
        key = F.struct(sv, (-F.col("doc_id")).alias("_tb")) if desc \
            else F.struct(sv, F.col("doc_id").alias("_tb"))
        pick = F.max_by if desc else F.min_by
        metrics = params["metrics"]
        if isinstance(metrics, dict):
            metrics = [metrics]
        out = [pick(F.col(m["field"]).cast("double"), key)
               .alias(f"{name}_{m['field']}") for m in metrics]
        out.append((F.max(sv) if desc else F.min(sv))
                   .alias(f"{name}_sort"))
        return out
    if kind == "weighted_avg":
        vv = F.col(params["value"]["field"]).cast("double")
        ww = F.col(params["weight"]["field"]).cast("double")
        both = F.when(vv.isNotNull() & ww.isNotNull(), True)
        return [(F.sum(F.when(both, vv * ww))
                 / F.sum(F.when(both, ww))).alias(name)]
    if kind in ("geo_bounds", "geo_centroid"):
        la = F.col(params["field"] + ".lat").cast("double")
        lo = F.col(params["field"] + ".lon").cast("double")
        if kind == "geo_bounds":
            return [F.max(la).alias(f"{name}_top"),
                    F.min(la).alias(f"{name}_bottom"),
                    F.min(lo).alias(f"{name}_left"),
                    F.max(lo).alias(f"{name}_right")]
        return [F.avg(la).alias(f"{name}_lat"),
                F.avg(lo).alias(f"{name}_lon"),
                F.count(la).alias(f"{name}_count")]
    if kind == "matrix_stats":
        # multi-field moments + pairwise covariance/correlation in
        # ONE hash aggregate.  Upstream (aggs-matrix-stats module)
        # excludes a document missing ANY of the fields; the same
        # gate here.  Conventions pinned by the numpy-twin test:
        # variance/covariance sample (ddof=1), skewness/kurtosis the
        # population-moment forms Spark streams natively (kurtosis
        # excess), correlation Pearson.
        fields = list(params["fields"])
        allp = reduce(Column.__and__,
                      [F.col(f).isNotNull() for f in fields])
        cols = {f: F.when(allp, F.col(f).cast("double")) for f in fields}
        out = []
        for f in fields:
            c = cols[f]
            out += [F.count(c).alias(f"{name}_{f}_count"),
                    F.avg(c).alias(f"{name}_{f}_mean"),
                    F.var_samp(c).alias(f"{name}_{f}_variance"),
                    F.skewness(c).alias(f"{name}_{f}_skewness"),
                    F.kurtosis(c).alias(f"{name}_{f}_kurtosis")]
        for i, fa in enumerate(fields):
            for fb in fields[i + 1:]:
                out += [F.covar_samp(cols[fa], cols[fb])
                        .alias(f"{name}_{fa}_{fb}_covariance"),
                        F.corr(cols[fa], cols[fb])
                        .alias(f"{name}_{fa}_{fb}_correlation")]
        return out
    if kind == "geo_line":
        # per-bucket path: points ordered by the sort field, capped
        # at size, emitted as a GeoJSON LineString coordinates array
        # (the wire's geometry.coordinates).  One collect_list in the
        # same hash agg -- the sort is a per-group array_sort, no
        # window, no extra shuffle; size caps the carried array.
        pt = params["point"]["field"]
        srt = params["sort"]["field"]
        size = int(params.get("size", 10000))
        order = str(params.get("sort_order", "asc")).lower()
        sk = F.col(srt).cast("double")
        if order == "desc":
            sk = -sk
        pts = F.collect_list(F.when(
            F.col(f"{pt}.lat").isNotNull() & sk.isNotNull(),
            F.struct(sk.alias("s"),
                     F.col(f"{pt}.lon").cast("double").alias("lon"),
                     F.col(f"{pt}.lat").cast("double").alias("lat"))))
        line = F.slice(F.array_sort(pts), 1, size)
        return [F.to_json(F.transform(
            line, lambda e: F.array(e["lon"], e["lat"]))).alias(name)]
    v = F.col(params["field"])
    num = v.cast("double")
    if kind == "boxplot":
        # exact interpolated quartiles (upstream is TDigest-
        # approximate; exact is a strict upgrade and oracle-able)
        f = params["field"]
        return [F.min(num).alias(f"{name}_min"),
                F.expr(f"percentile({f}, 0.25)").alias(f"{name}_q1"),
                F.expr(f"percentile({f}, 0.5)").alias(f"{name}_q2"),
                F.expr(f"percentile({f}, 0.75)").alias(f"{name}_q3"),
                F.max(num).alias(f"{name}_max")]
    if kind == "extended_stats":
        return [F.count(v).alias(f"{name}_count"),
                F.min(num).alias(f"{name}_min"),
                F.max(num).alias(f"{name}_max"),
                F.avg(num).alias(f"{name}_avg"),
                F.sum(num).alias(f"{name}_sum"),
                F.sum(num * num).alias(f"{name}_sum_of_squares"),
                F.var_pop(num).alias(f"{name}_variance"),
                F.stddev_pop(num).alias(f"{name}_std_deviation")]
    if kind == "avg":
        return [F.avg(num).alias(name)]
    if kind == "sum":
        return [F.sum(num).alias(name)]
    if kind == "min":
        return [F.min(num).alias(name)]
    if kind == "max":
        return [F.max(num).alias(name)]
    if kind == "value_count":
        return [F.count(v).alias(name)]
    if kind == "cardinality":
        return [F.countDistinct(v).alias(name)]
    if kind == "stats":
        return [F.count(v).alias(f"{name}_count"),
                F.min(num).alias(f"{name}_min"),
                F.max(num).alias(f"{name}_max"),
                F.avg(num).alias(f"{name}_avg"),
                F.sum(num).alias(f"{name}_sum")]
    if kind == "percentiles":
        pcts = [float(p) for p in params.get("percents", (50.0,))]
        return [F.expr(
            f"percentile({params['field']}, {p / 100.0})"
        ).alias(f"{name}_p{p:g}".replace(".", "_")) for p in pcts]
    if kind == "percentile_ranks":
        # percent of values <= each cutoff (the OpenSearch response
        # shape) -- one conditional-count per cutoff, same single agg
        vals = [float(x) for x in params["values"]]
        return [(F.sum(F.when(num <= F.lit(x), 1).otherwise(0))
                 * 100.0 / F.count(num)
                 ).alias(f"{name}_r{x:g}".replace(".", "_"))
                for x in vals]
    if kind == "string_stats":
        ln = F.length(v.cast("string"))
        return [F.count(v).alias(f"{name}_count"),
                F.min(ln).alias(f"{name}_min_length"),
                F.max(ln).alias(f"{name}_max_length"),
                F.avg(ln.cast("double")).alias(f"{name}_avg_length")]
    raise ValueError(f"unsupported metric agg {kind!r}")


_PARENT_PIPE_KINDS = ("derivative", "cumulative_sum", "moving_avg",
                      "moving_fn", "serial_diff", "bucket_script",
                      "bucket_selector", "bucket_sort", "normalize",
                      "cumulative_cardinality", "moving_percentiles")
_SIBLING_PIPE_KINDS = ("avg_bucket", "sum_bucket", "min_bucket",
                       "max_bucket", "stats_bucket",
                       "percentiles_bucket", "extended_stats_bucket")


def _pct_label(p: float) -> str:
    """99 -> 'p99', 99.9 -> 'p99_9' (column-name-safe)."""
    s = f"{p:g}".replace(".", "_")
    return f"p{s}"


def _pipe_window(levels: list[tuple]):
    """Pipeline-agg window: ordered by the innermost bucket key,
    partitioned by the parent keys (nested pipelines run per parent
    bucket).  The frame is the REDUCED bucket list -- metadata-sized,
    the OpenSearch coordinator-phase shape."""
    if not levels:
        raise ValueError("parent pipeline aggs need a bucket level")
    keys = [n for n, _k, _e, _p in levels]
    part, order = keys[:-1], keys[-1]
    w = (Window.partitionBy(*part) if part else Window
         ).orderBy(F.asc(order))
    return w, order


def _parent_pipe(frame: DataFrame, levels: list[tuple], name: str,
                 kind: str, params: dict) -> DataFrame:
    """One parent pipeline agg over the materialized bucket frame."""
    w, order = _pipe_window(levels)
    bp = params.get("buckets_path")
    if kind in ("bucket_script", "bucket_selector"):
        from .painless import parse_script, to_column
        env = {
            f"params.{var}": F.col("doc_count" if p == "_count" else p)
            .cast("double")
            for var, p in dict(bp or {}).items()
        }
        src = params["script"]
        src = src["source"] if isinstance(src, dict) else str(src)
        expr = to_column(parse_script(src), env)
        if kind == "bucket_script":
            return frame.withColumn(name, expr)
        return frame.filter(expr.cast("boolean"))
    if kind == "bucket_sort":
        order_cols = _order_cols(params.get("sort", []))
        if not params.get("sort"):
            order_cols = [F.asc(order)]
        size = params.get("size")
        out = frame.orderBy(*order_cols)
        return out.limit(int(size)) if size is not None else out
    if kind == "cumulative_cardinality":
        # running distinct count across the ordered buckets.  The
        # per-bucket HLL sketches (hidden _hll_<name> column emitted
        # in the SAME hash aggregate as the other metrics) merge
        # cumulatively with hll_union_agg over an expanding window --
        # the upstream implementation is exactly this sketch merge,
        # and mergeability is what makes the op shard-agnostic at
        # 100 TB (an exact running distinct would need the raw value
        # sets per bucket).  DataSketches HLL is exact in sparse mode
        # (small per-bucket cardinalities), ~1.6% beyond.
        w2 = w.rowsBetween(Window.unboundedPreceding,
                           Window.currentRow)
        sk = F.col(f"_hll_{name}")
        return (frame.withColumn(
            name, F.hll_sketch_estimate(F.hll_union_agg(sk).over(w2))
            .cast("double")).drop(f"_hll_{name}"))
    if kind == "moving_percentiles":
        # percentiles over the UNION of raw values in the trailing
        # ``window`` buckets (incl. current — the frame convention
        # moving_fn uses above).  Upstream merges the sibling
        # percentiles agg's TDigest sketch states over the window;
        # we ride exact per-bucket value lists through the same hash
        # aggregate — exact where the wire is approximate.  The
        # window concat runs over the REDUCED bucket frame
        # (metadata-sized, coordinator-phase); at 100 TB a bounded
        # percentile_approx state column would be the sketch analog.
        win = int(params.get("window", 5))
        merged = F.array_sort(F.flatten(
            F.collect_list(F.col(f"_vals_{name}")).over(
                w.rowsBetween(-(win - 1), 0))))
        out = frame.withColumn(f"_mw_{name}", merged)
        vals = F.col(f"_mw_{name}")
        n = F.size(vals)
        for p in params["percents"]:
            # exact linear interpolation: rank = p*(n-1), the same
            # definition SQL percentile() and numpy 'linear' use
            rank = F.lit(float(p) / 100.0) * (n - 1).cast("double")
            lo = F.floor(rank).cast("int")
            hi = F.ceil(rank).cast("int")
            frac = rank - lo.cast("double")
            val = (F.element_at(vals, lo + 1) * (F.lit(1.0) - frac)
                   + F.element_at(vals, hi + 1) * frac)
            out = out.withColumn(f"{name}_{_pct_label(p)}",
                                 F.when(n > 0, val))
        return out.drop(f"_mw_{name}", f"_vals_{name}")
    col = F.col("doc_count" if bp in (None, "_count") else str(bp))
    col = col.cast("double")
    if kind == "normalize":
        # whole-partition rescale of a bucket metric (OpenSearch
        # normalize pipeline); the frame is the reduced bucket list
        full = w.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
        method = str(params.get("method", "rescale_0_1"))
        mn, mx = F.min(col).over(full), F.max(col).over(full)
        exprs = {
            "rescale_0_1": (col - mn) / (mx - mn),
            "rescale_0_100": F.lit(100.0) * (col - mn) / (mx - mn),
            "percent_of_sum": col / F.sum(col).over(full),
            "mean": (col - F.avg(col).over(full)) / (mx - mn),
            "z-score": (col - F.avg(col).over(full))
            / F.stddev_pop(col).over(full),
            "softmax": F.exp(col) / F.sum(F.exp(col)).over(full),
        }
        if method not in exprs:
            raise ValueError(f"unsupported normalize method {method!r}")
        return frame.withColumn(name, exprs[method])
    if kind == "derivative":
        return frame.withColumn(name, col - F.lag(col).over(w))
    if kind == "cumulative_sum":
        return frame.withColumn(name, F.sum(col).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    if kind == "serial_diff":
        return frame.withColumn(
            name, col - F.lag(col, int(params.get("lag", 1))).over(w))
    # moving_avg / moving_fn over a trailing window-bucket frame;
    # moving_fn accepts the shipped "MovingFunctions.<fn>(values)"
    # script shape (the only scripts OpenSearch ships built-in)
    fn = str(params.get("fn", "avg"))
    if "script" in params:
        src = params["script"]
        src = src["source"] if isinstance(src, dict) else str(src)
        m = re.match(r"^\s*MovingFunctions\.(\w+)\(values\)\s*$", src)
        if not m:
            raise ValueError(
                "moving_fn script must be MovingFunctions."
                "<min|max|sum|avg|stddev>(values)")
        fn = {"unweightedAvg": "avg"}.get(m.group(1), m.group(1))
    win = int(params.get("window", 5))
    reducer = {"min": F.min, "max": F.max, "sum": F.sum,
               "avg": F.avg, "stddev": F.stddev_samp}[fn]
    return frame.withColumn(name, reducer(col).over(
        w.rowsBetween(-(win - 1), 0)))


def _split_agg_node(node: dict) -> tuple[tuple | None, list, dict]:
    """One named agg entry -> (bucket, metrics, sub_aggs)."""
    bucket = None
    metrics = []
    for kind, params in node.items():
        if kind == "aggs" or kind == "aggregations":
            continue
        if kind in _BUCKET_KINDS:
            bucket = (kind, params)
        elif kind in _METRIC_KINDS:
            metrics.append((kind, params))
        else:
            raise ValueError(f"unsupported agg {kind!r}")
    subs = node.get("aggs", node.get("aggregations", {}))
    return bucket, metrics, subs


def _nested_element_frame(frame: DataFrame, path: str) -> DataFrame:
    """The ``nested`` aggregation's bucket-context switch: one row
    per ARRAY ELEMENT of the nested field at ``path``, with the
    element struct grafted back in place of the array so every
    sub-agg field reference (``path.sub.field``) resolves through
    the ordinary column-path machinery.  Parent columns (doc_id,
    keywords) stay on the row — repeated per element — which is what
    lets ``reverse_nested`` recover parent counts without a join.

    One explode per nested agg; at 100 TB the fan-out is bounded by
    elements-per-doc (enrichment arrays are small), and no shuffle is
    introduced — the explode is map-side."""
    segs = path.split(".")
    ex = frame.withColumn("_nested_elem", F.explode(F.col(path)))

    def graft(col: Column, rest: list[str]) -> Column:
        if len(rest) == 1:
            return col.withField(rest[0], F.col("_nested_elem"))
        return col.withField(
            rest[0], graft(col[rest[0]], rest[1:]))

    if len(segs) == 1:
        ex = ex.withColumn(segs[0], F.col("_nested_elem"))
    else:
        ex = ex.withColumn(segs[0], graft(F.col(segs[0]), segs[1:]))
    return ex.drop("_nested_elem")


def run_aggs(docs: DataFrame, aggs_spec: dict,
             text_field: str = DEFAULT_TEXT_FIELD,
             background: DataFrame | None = None) -> dict[str, DataFrame]:
    """Recursive aggregations over the (query-matched) docs set.

    Each bucket CHAIN (terms > date_histogram > ... > metrics)
    flattens into ONE groupBy over the full key path; terms-size
    pruning runs as windows over the aggregated bucket rows (shuffle
    carries buckets, not docs).  Sibling aggs fork: the result dict
    maps 'a' / 'a>b' path names to bucket DataFrames whose columns are
    the path's key columns + doc_count + metric columns.

    ``top_hits`` sub-aggs return DOC rows (bucket keys + doc columns +
    ``_rn`` rank) via a WindowGroupLimit-shaped ranked window over the
    surviving buckets.  ``significant_terms`` (top level only) ranks
    keys by JLH against ``background`` (pass the full docs table;
    defaults to the foreground itself, which degenerates to zero
    scores, so pass it).
    """
    out: dict[str, DataFrame] = {}
    bucket_meta: dict[str, tuple] = {}  # level name -> (kind, params)

    def walk(path: list[str], levels: list[tuple], spec: dict,
             frame: DataFrame | None = None) -> None:
        # all sibling PURE-METRIC entries at one path share ONE
        # groupBy (one shuffle); sibling bucket entries fork.
        # Pipeline entries (parent: derivative/cumulative_sum/...;
        # sibling: avg_bucket/... referencing "bucket>metric") apply
        # AFTER the reduce, over the metadata-sized bucket frames --
        # the OpenSearch coordinator-phase contract.
        frame = docs if frame is None else frame
        metric_cols: list[tuple] = []
        parent_pipes: list[tuple] = []
        sibling_pipes: list[tuple] = []
        for name, node in spec.items():
            pk = next(iter(node))
            if pk in _PARENT_PIPE_KINDS:
                parent_pipes.append((name, pk, node[pk]))
                continue
            if pk in _SIBLING_PIPE_KINDS:
                sibling_pipes.append((name, pk, node[pk]))
                continue
            if "top_hits" in node:
                out[">".join(path + [name])] = _materialize_hits(
                    levels, node["top_hits"], frame)
                continue
            if pk in ("sampler", "diversified_sampler"):
                # score-ordered sample restrictors: the subtree runs
                # over the top shard_size matched docs (diversified:
                # at most max_docs_per_value per key first) — the
                # cost-control agg dashboards put over significant_*
                if levels:
                    raise ValueError(
                        f"{pk} agg is supported at the top level of "
                        "the aggs tree")
                p = node[pk]
                n = int(p.get("shard_size", 100))
                if "score" in frame.columns:
                    ordered = [F.desc("score"), F.asc("doc_id")]
                else:
                    ordered = [F.asc("doc_id")]
                samp = frame
                if pk == "diversified_sampler":
                    dw = Window.partitionBy(p["field"]).orderBy(*ordered)
                    samp = (samp.withColumn("_dr",
                                            F.row_number().over(dw))
                            .filter(F.col("_dr") <= int(
                                p.get("max_docs_per_value", 1)))
                            .drop("_dr"))
                samp = samp.orderBy(*ordered).limit(n)
                subs = node.get("aggs", node.get("aggregations", {}))
                if subs:
                    walk(path + [name], [], subs, samp)
                if ">".join(path + [name]) not in out:
                    out[">".join(path + [name])] = samp.agg(
                        F.count(F.lit(1)).alias("doc_count"))
                continue
            if pk in ("filter", "global", "missing", "nested",
                      "children", "parent"):
                # single-bucket restrictors: the subtree re-runs over
                # the restricted frame (filter = extra predicate;
                # missing = field-is-null; global = escape the query
                # to the background corpus; nested = switch the
                # bucket context from parents to array ELEMENTS).
                # Top level only — single-bucket restriction under a
                # key fan-out would need key-carrying filters; no
                # dashboard uses it.
                if levels:
                    raise ValueError(
                        f"{pk} agg is supported at the top level of "
                        "the aggs tree")
                if pk == "filter":
                    sub_frame = frame.filter(
                        _filter_pred(node["filter"], text_field,
                                     frame=frame))
                elif pk == "missing":
                    sub_frame = frame.filter(
                        F.col(node["missing"]["field"]).isNull())
                elif pk == "nested":
                    # one explode (the agg DOES fan out to elements,
                    # unlike the nested QUERY); the exploded element
                    # struct is grafted back onto its path so
                    # sub-agg field names resolve unchanged, and
                    # doc_id still rides along for reverse_nested
                    sub_frame = _nested_element_frame(
                        frame, str(node["nested"]["path"]))
                elif pk in ("children", "parent"):
                    # join-field context switch: from the MATCHED
                    # docs to their children of `type` (children
                    # agg) / their parents of `parent_type` (parent
                    # agg), both drawn from the full index.  One
                    # semi-join on the routing key — the distinct
                    # id side is matched-set-sized, AQE broadcasts
                    # it when selective; at scale both sides
                    # co-locate on the routing-key bucketing the
                    # join-field layout prescribes.
                    if background is None:
                        raise ValueError(
                            f"{pk} agg needs background= (the full "
                            "docs table with the join-field columns)")
                    p = node[pk]
                    for c in ("join_name", "join_parent"):
                        if c not in background.columns:
                            raise ValueError(
                                f"{pk} agg needs docs column {c!r}")
                    if pk == "children":
                        ids = (frame.select(F.col("doc_id")
                                            .alias("_jid")).distinct())
                        sub_frame = (
                            background
                            .filter((F.col("join_name")
                                     == str(p["type"]))
                                    & F.col("join_parent").isNotNull())
                            .join(ids, F.col("join_parent")
                                  .cast("string")
                                  == F.col("_jid").cast("string"),
                                  "left_semi"))
                    else:
                        ids = (frame
                               .filter(F.col("join_parent").isNotNull())
                               .select(F.col("join_parent")
                                       .alias("_jid")).distinct())
                        sub_frame = (
                            background
                            .filter(F.col("join_name")
                                    == str(p["parent_type"]))
                            .join(ids, F.col("doc_id").cast("string")
                                  == F.col("_jid").cast("string"),
                                  "left_semi"))
                else:
                    if background is None:
                        raise ValueError(
                            "global agg needs background= (the full "
                            "docs table)")
                    sub_frame = background
                subs = node.get("aggs", node.get("aggregations", {}))
                if subs:
                    walk(path + [name], [], subs, sub_frame)
                # pure-metric subtrees land AT this path with their
                # own doc_count column; otherwise emit the count frame
                if ">".join(path + [name]) not in out:
                    out[">".join(path + [name])] = sub_frame.agg(
                        F.count(F.lit(1)).alias("doc_count"))
                continue
            if pk == "rare_terms":
                if levels:
                    raise ValueError(
                        "rare_terms is supported at the top level of "
                        "the aggs tree")
                from ..operators.aggs import rare_terms

                p = node["rare_terms"]
                out[">".join(path + [name])] = rare_terms(
                    frame.filter(F.col(p["field"]).isNotNull()),
                    F.col(p["field"]).cast("string"),
                    max_doc_count=int(p.get("max_doc_count", 1)),
                    size=int(p.get("size", 10)),
                )
                continue
            if "composite" in node:
                if levels:
                    raise ValueError("composite must be top-level")
                out[">".join(path + [name])] = _composite(node)
                continue
            if "significant_terms" in node:
                if levels:
                    raise ValueError(
                        "significant_terms is supported at the top "
                        "level of the aggs tree"
                    )
                p = node["significant_terms"]
                from ..operators.aggs import significant_terms

                bg = background if background is not None else frame
                fg_ids = frame.select("doc_id").withColumn(
                    "_fg", F.lit(True))
                flagged = bg.join(fg_ids, "doc_id", "left")
                out[">".join(path + [name])] = significant_terms(
                    flagged, p["field"],
                    F.col("_fg").isNotNull(),
                    size=int(p.get("size", 10)),
                    min_doc_count=int(p.get("min_doc_count", 1)),
                )
                continue
            bucket, metrics, subs = _split_agg_node(node)
            if bucket is None:
                if len(metrics) != 1 or subs:
                    raise ValueError(
                        f"agg {name!r}: a metric agg holds exactly one "
                        "metric and no sub-aggs"
                    )
                mk, mp = metrics[0]
                metric_cols.append((name, mk, mp))
                continue
            if metrics:
                raise ValueError(
                    f"agg {name!r}: metrics must be named sub-aggs, "
                    "not attached to a bucket node"
                )
            kind, params = bucket
            key, needs_explode, prune = _bucket_expr(kind, params,
                                                     text_field, frame)
            bucket_meta[name] = (kind, params)
            lv = levels + [(name, key, needs_explode, prune)]
            if subs:
                walk(path + [name], lv, subs, frame)
            else:
                out[">".join(path + [name])] = _materialize(lv, [],
                                                            frame)
        for i, (pname, pkind, pparams) in enumerate(parent_pipes):
            # sketch-state pipelines need a MERGEABLE per-bucket
            # state, not the reduced scalar their buckets_path
            # names: ride a hidden state column through the same
            # hash agg (HLL sketch for cumulative_cardinality, the
            # raw value list for moving_percentiles — upstream rides
            # the sibling percentiles agg's TDigest states)
            if pkind == "cumulative_cardinality":
                ref = spec.get(str(pparams.get("buckets_path", "")),
                               {})
                if "cardinality" not in ref:
                    raise ValueError(
                        "cumulative_cardinality buckets_path must "
                        "name a sibling cardinality agg")
                metric_cols.append(
                    (f"_hll_{pname}", "_hll_sketch",
                     {"field": ref["cardinality"]["field"]}))
            elif pkind == "moving_percentiles":
                ref = spec.get(str(pparams.get("buckets_path", "")),
                               {})
                if "percentiles" not in ref:
                    raise ValueError(
                        "moving_percentiles buckets_path must name "
                        "a sibling percentiles agg")
                metric_cols.append(
                    (f"_vals_{pname}", "_vals_list",
                     {"field": ref["percentiles"]["field"]}))
                # defaults track the referenced sibling exactly (the
                # percentiles metric's own default) so the pipeline
                # never emits percents its buckets_path never computed
                parent_pipes[i] = (pname, pkind, {
                    **pparams,
                    "percents": ref["percentiles"].get(
                        "percents", (50.0,))})
        if metric_cols or parent_pipes:
            red = _materialize(levels, metric_cols, frame)
            for name, kind, params in parent_pipes:
                red = _parent_pipe(red, levels, name, kind, params)
            out[">".join(path) if path else "_metrics"] = red
        for name, kind, params in sibling_pipes:
            # sibling-bucket metric: reduce a sibling bucket agg's
            # frame ("bucket>metric" path) per parent key
            bp = str(params["buckets_path"])
            head, _, metric = bp.partition(">")
            key = ">".join(path + [head])
            if key not in out:
                raise ValueError(
                    f"{kind} buckets_path {bp!r}: no sibling bucket "
                    f"agg {head!r}")
            child = out[key]
            vcol = F.col("doc_count" if metric in ("", "_count")
                         else metric)
            pkeys = [n for n, _k, _e, _p in levels]
            fns = {"avg_bucket": [F.avg(vcol).alias(name)],
                   "sum_bucket": [F.sum(vcol).alias(name)],
                   "min_bucket": [F.min(vcol).alias(name)],
                   "max_bucket": [F.max(vcol).alias(name)],
                   "stats_bucket": [
                       F.count(vcol).alias(f"{name}_count"),
                       F.min(vcol).alias(f"{name}_min"),
                       F.max(vcol).alias(f"{name}_max"),
                       F.avg(vcol).alias(f"{name}_avg"),
                       F.sum(vcol).alias(f"{name}_sum")],
                   "extended_stats_bucket": [
                       F.count(vcol).alias(f"{name}_count"),
                       F.min(vcol).alias(f"{name}_min"),
                       F.max(vcol).alias(f"{name}_max"),
                       F.avg(vcol).alias(f"{name}_avg"),
                       F.sum(vcol).alias(f"{name}_sum"),
                       F.sum(vcol * vcol)
                       .alias(f"{name}_sum_of_squares"),
                       F.var_pop(vcol).alias(f"{name}_variance"),
                       F.stddev_pop(vcol)
                       .alias(f"{name}_std_deviation")],
                   # exact over the reduced bucket list, like the
                   # coordinator (the wire API's TDigest is doc-level)
                   "percentiles_bucket": [
                       F.percentile(vcol, F.lit(p / 100.0))
                       .alias(f"{name}_{_pct_label(p)}")
                       for p in params.get(
                           "percents", [1, 5, 25, 50, 75, 95, 99])
                   ]}[kind]
            red = (child.groupBy(*pkeys).agg(*fns) if pkeys
                   else child.agg(*fns))
            out[">".join(path + [name])] = red

    def _materialize(levels: list[tuple], metrics: list[tuple],
                     frame: DataFrame | None = None) -> DataFrame:
        df = docs if frame is None else frame
        keys = []
        for name, key, needs_explode, _ in levels:
            if needs_explode:
                df = df.withColumn(name, F.explode(key))
            else:
                df = df.withColumn(name, key)
            keys.append(name)
        mexprs = []
        mads: list[tuple[str, dict]] = []
        for mn, mk, mp in metrics:
            if mk == "rate":
                mexprs.append(_rate_expr(mn, mp, levels, bucket_meta))
            elif mk == "median_absolute_deviation":
                # exact MAD needs the bucket median first -- pass 1
                # carries it as a hidden column, pass 2 (below) joins
                # the bucket-sized medians back and reduces the
                # absolute deviations. Two doc passes, bucket-sized
                # join sides (AQE broadcasts them), never approximate
                # (the wire API's TDigest is; exactness documented).
                mads.append((mn, mp))
                mexprs.append(
                    F.expr(f"percentile({mp['field']}, 0.5)")
                    .alias(f"_med_{mn}"))
            else:
                mexprs.extend(_metric_exprs(mn, mk, mp))

        def attach_mad(g: DataFrame, kdf: DataFrame) -> DataFrame:
            for mn, mp in mads:
                fld = mp["field"]
                dev = F.expr(
                    f"percentile(abs({fld} - _med_{mn}), 0.5)")
                if keys:
                    med = g.select(*keys, f"_med_{mn}")
                    m2 = (kdf.join(med, keys)
                          .groupBy(*keys).agg(dev.alias(mn)))
                    g = g.join(m2, keys, "left").drop(f"_med_{mn}")
                else:
                    m2 = (kdf.crossJoin(g.select(f"_med_{mn}"))
                          .agg(dev.alias(mn)))
                    g = g.crossJoin(m2).drop(f"_med_{mn}")
            return g

        if not keys:
            return attach_mad(
                df.agg(F.count(F.lit(1)).alias("doc_count"), *mexprs),
                df)
        g = (df.filter(reduce(Column.__and__,
                              [F.col(k).isNotNull() for k in keys]))
             .groupBy(*keys)
             .agg(F.count(F.lit(1)).alias("doc_count"), *mexprs))
        g = attach_mad(g, df)
        # per-level terms-size pruning: top-N keys by the level's
        # order spec (_count default, _key, or a metric -- metric
        # ordering needs the metric in THIS groupBy, i.e. the terms
        # level must be the deepest bucket level) within the parent
        # key prefix, ties by key asc
        metric_names = {mn for mn, _mk, _mp in metrics}
        for i, (name, _k, _e, prune) in enumerate(levels):
            if prune is None:
                continue
            size, by, dirn = prune["size"], prune["by"], prune["dir"]
            is_last = i == len(levels) - 1
            if by not in ("_count", "_key"):
                if not (is_last and by in metric_names):
                    raise ValueError(
                        f"terms order by metric {by!r} needs the "
                        "metric computed at this level (deepest "
                        "bucket only)"
                    )
            parents = keys[:i]

            def _dir(c: Column) -> Column:
                return c.desc() if dirn == "desc" else c.asc()

            if not parents:
                # top level: an unpartitioned window would single-task
                # ALL bucket rows (terms on a high-cardinality field at
                # 100 TB). TakeOrderedAndProject the winning keys and
                # broadcast-semi-join back instead: the driver holds
                # `size` keys, never the bucket set.
                if by == "_key":
                    winners = (g.select(name).distinct()
                               .orderBy(_dir(F.col(name))).limit(size))
                elif by == "_count":
                    winners = (g.groupBy(name)
                               .agg(F.sum("doc_count").alias("_t"))
                               .orderBy(_dir(F.col("_t")), F.asc(name))
                               .limit(size).select(name))
                else:  # metric order, single-level: rows ARE buckets
                    winners = (g.orderBy(_dir(F.col(by)), F.asc(name))
                               .limit(size).select(name))
                g = g.join(F.broadcast(winners), name, "left_semi")
                continue
            # nested level: windows over the ALREADY-AGGREGATED bucket
            # rows, partitioned by the parent prefix (no global sort)
            if by == "_key":
                wrank = Window.partitionBy(*parents).orderBy(
                    _dir(F.col(name)))
                g = (g.withColumn("_rk", F.dense_rank().over(wrank))
                     .filter(F.col("_rk") <= size).drop("_rk"))
                continue
            if by == "_count":
                wsum = Window.partitionBy(*parents, name)
                g = g.withColumn(
                    "_lvl_total", F.sum("doc_count").over(wsum))
                val = F.col("_lvl_total")
            else:  # metric at the deepest level: one row per key
                val = F.col(by)
            wrank = Window.partitionBy(*parents).orderBy(
                _dir(val), F.asc(name))
            g = (g.withColumn("_rk", F.dense_rank().over(wrank))
                 .filter(F.col("_rk") <= size)
                 .drop("_rk", *( ["_lvl_total"] if by == "_count" else [])))
        # min_doc_count: 0 -- fill the empty rungs of the histogram
        # ladder (dashboards need a continuous time axis). Single
        # level only; bounds from extended_bounds or the observed key
        # range (a bucket-sized driver probe); the ladder is generated
        # driver-side (bounded by a 10k-bucket cap, the wire's
        # soft-limit analog) and left-joined -- never a corpus scan.
        if len(levels) == 1:
            lname = levels[0][0]
            lkind, lparams = bucket_meta.get(lname, (None, {}))
            mdc = int(lparams.get("min_doc_count", 1))
            if lkind in ("date_histogram", "histogram") and mdc == 0:
                g = _fill_empty_buckets(g, lname, lkind, lparams, metrics)
            elif mdc > 1:
                # floor on the reduced bucket rows (the coordinator
                # filter; for terms this runs after the size cut --
                # identical under the default _count ordering)
                g = g.filter(F.col("doc_count") >= mdc)
        # response-order contract (single level only): OpenSearch
        # returns terms buckets sorted by the order spec and
        # histogram-family buckets by key.  The sort runs AFTER
        # pruning, over the surviving buckets (size-bounded for terms)
        # -- a trivial final exchange, never a corpus-sized sort.
        # Multi-level flat rows represent a bucket TREE; they stay
        # unordered (callers sort per-parent as needed).
        if len(levels) == 1:
            name, _k, _e, prune = levels[0]
            if prune is not None:
                by, dirn = prune["by"], prune["dir"]
                col = (F.col(name) if by == "_key"
                       else F.col("doc_count") if by == "_count"
                       else F.col(by))
                lead = col.desc() if dirn == "desc" else col.asc()
                g = g.orderBy(lead, F.asc(name))
            else:
                g = g.orderBy(F.asc(name))
        return g

    def _composite(node: dict) -> DataFrame:
        """composite agg: deterministic key-tuple bucket pagination.
        The after-cursor is a native struct comparison BEFORE the
        aggregation, so deep pages never recompute earlier pages'
        buckets (operators/aggs.py composite_page semantics, plus
        metric sub-aggs)."""
        p = node["composite"]
        names, df = [], docs
        for src in p["sources"]:
            sname, sspec = _one(src)
            skind, sparams = _one(sspec)
            key, needs_explode, _pr = _bucket_expr(skind, sparams,
                                                   text_field, docs)
            if needs_explode:
                raise ValueError(
                    "composite sources must be single-valued buckets")
            df = df.withColumn(sname, key)
            names.append(sname)
        df = df.filter(reduce(Column.__and__,
                              [F.col(n).isNotNull() for n in names]))
        after = p.get("after")
        if after:
            key_struct = F.struct(*[F.col(n) for n in names])
            df = df.filter(key_struct > F.struct(*[
                F.lit(after[n]).cast(df.schema[n].dataType).alias(n)
                for n in names
            ]))
        mexprs = []
        for mn, mnode in (node.get("aggs") or {}).items():
            mb, mm, msubs = _split_agg_node(mnode)
            if mb is not None or msubs or len(mm) != 1:
                raise ValueError(
                    "composite sub-aggs must be single metrics")
            mexprs.extend(_metric_exprs(mn, *mm[0]))
        return (df.groupBy(*names)
                .agg(F.count(F.lit(1)).alias("doc_count"), *mexprs)
                .orderBy(*[F.asc(n) for n in names])
                .limit(int(p.get("size", 10))))

    def _materialize_hits(levels: list[tuple], spec: dict,
                          frame: DataFrame | None = None) -> DataFrame:
        """top_hits leaf: per-bucket best docs under the spec's sort.
        Bucket survival (terms size) must match the sibling bucket
        rows, so the pruned bucket keys come from the same
        _materialize plan and semi-join the doc rows."""
        if not levels:
            raise ValueError("top_hits needs an enclosing bucket agg")
        size = int(spec.get("size", 1))
        order = _order_cols(spec.get("sort", []), text_field)
        order.append(F.asc("doc_id"))
        df = docs if frame is None else frame
        keys = []
        for name, key, needs_explode, _ in levels:
            if needs_explode:
                df = df.withColumn(name, F.explode(key))
            else:
                df = df.withColumn(name, key)
            keys.append(name)
        df = df.filter(reduce(Column.__and__,
                              [F.col(k).isNotNull() for k in keys]))
        if any(size_ is not None for *_x, size_ in levels):
            survivors = _materialize(levels, [], frame).select(*keys)
            df = df.join(F.broadcast(survivors), keys, "left_semi")
        w = Window.partitionBy(*keys).orderBy(*order)
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= size))

    walk([], [], aggs_spec)
    return out


def _sorted_route(sorted_docs, body: dict):
    """Transparent index-sort routing (the star-tree pattern for the
    hits page): a match_all body whose single sort field IS the
    sorted layout's field answers from the boundary buckets via
    SortedDocs.topk -- reading only the dirs the manifest walk picks.
    Anything the layout cannot answer identically returns None (the
    document path runs instead): scoring queries, _score/multi-field
    sorts, from/search_after cursors, collapse, post_filter."""
    q = body.get("query", {"match_all": {}})
    lo = hi = None
    if list(q) == ["range"] and list(q["range"]) == [
            sorted_docs.sort_field]:
        # the dashboards' time-range shape: a single range filter ON
        # the sorted field -> manifest split-point pruning
        spec = q["range"][sorted_docs.sort_field]
        if not set(spec) <= {"gte", "lte"}:
            return None    # gt/lt strictness: document path

        def _num(x):
            if isinstance(x, (int, float)):
                return float(x)
            import datetime as _dt
            return _dt.datetime.fromisoformat(str(x)).replace(
                tzinfo=_dt.timezone.utc).timestamp()

        lo = _num(spec["gte"]) if "gte" in spec else None
        hi = _num(spec["lte"]) if "lte" in spec else None
    elif list(q) != ["match_all"]:
        return None
    sort = body.get("sort")
    if not isinstance(sort, list) or len(sort) != 1:
        return None
    ent = sort[0]
    if isinstance(ent, str):
        fld, order = ent, "asc"
    elif isinstance(ent, dict) and len(ent) == 1:
        (fld, spec), = ent.items()
        if isinstance(spec, dict):
            # the layout hardcodes scalar nulls-last ordering: any
            # missing/mode/nested option changes the page -> document
            # path (routing must stay result-identical)
            if set(spec) - {"order"}:
                return None
            order = spec.get("order", "asc")
        else:
            order = str(spec)
    else:
        return None
    if fld != sorted_docs.sort_field:
        return None
    for blocked in ("from", "search_after", "collapse", "post_filter",
                    "min_score"):
        if body.get(blocked):
            return None
    k = int(body.get("size", 10))
    desc = str(order).lower() == "desc"
    if lo is not None or hi is not None:
        out = sorted_docs.topk_range(k, lo=lo, hi=hi, desc=desc)
    else:
        out = sorted_docs.topk(k, desc=desc)
    return out.withColumn("score", F.lit(1.0))


class SearchBodyResponse(dict):
    """``search_body``'s result: a plain response dict (fully
    backward-compatible) plus an explicit lifecycle handle for the
    shared persisted matched frame, mirroring
    ``msearch.MSearchResponse.release``.  A long-running service that
    issues many bodies must call :meth:`release` once a response is
    consumed — otherwise each shareable body leaves one cached frame
    behind until the ContextCleaner happens to reclaim it.

    Scope: covers the shareable-aggs persist (the corpus-sized cache).
    ``terminate_after`` probes use an eager ``localCheckpoint`` whose
    blocks (<= cap+1 rows, request-metadata sized) have no public
    release API in PySpark; those remain ContextCleaner-reclaimed —
    bounded by the caller's own terminate_after, never corpus-sized."""

    shared = None  # the persisted matched frame, when one was shared

    def release(self) -> None:
        """Unpersist the shared matched frame (idempotent)."""
        if self.shared is not None:
            self.shared.unpersist()
            self.shared = None


def search_body(
    ix: PostingsIndex,
    body: dict,
    positional_ix: PostingsIndex | None = None,
    text_field: str = DEFAULT_TEXT_FIELD,
    vecs: DataFrame | None = None,
    source_docs: DataFrame | None = None,
    sparse=None,
    startree=None,
    sorted_docs=None,
) -> dict:
    """Full ``_search`` execution: returns ``{"hits": DataFrame,
    "aggs": {path: DataFrame}}``.  Aggregations run over the complete
    matched doc set (not the hits page), exactly like OpenSearch --
    except knn/hybrid queries, whose matched set IS the top-k/fused
    cut.

    ``startree=``: an ``operators.startree.StarTree`` handle makes
    covered aggregation bodies (dim-only query, terms/date_histogram
    buckets with algebraic metrics) answer from the pre-aggregated
    cube -- one grouping slice of bucket rows, zero document I/O --
    with automatic fallback to the document path when not coverable
    (the OpenSearch star-tree contract: routing is transparent,
    results identical)."""
    if body.get("runtime_mappings"):
        # derive once; strip the key so search_hits doesn't re-apply
        # (declarative ops like ``inc`` are not idempotent)
        ix = with_runtime_mappings(ix, body["runtime_mappings"])
        body = {k: v for k, v in body.items() if k != "runtime_mappings"}
    _m_cache: list = []

    def matched_frame() -> DataFrame:
        """The full query-matched set, built at most once and shared
        by aggs / track_total_hits / terminated_early."""
        if _m_cache:
            return _m_cache[0]
        qnode = expand_mlt(body.get("query", {"match_all": {}}), ix,
                           source_docs, text_field)
        qnode = resolve_terms_lookup(qnode, ix)
        qkind, _ = _one(qnode)
        if qkind in ("knn", "hybrid"):
            m = _vector_scored(ix, qnode, positional_ix,
                               text_field, vecs, "vec_id",
                               "embedding", sparse=sparse)
        elif qkind == "neural_sparse":
            m = _sparse_scored(ix, qnode, sparse)
        elif qkind == "nested":
            # dedicated path so ignore_unmapped / score_mode hold for
            # aggs and track_total_hits, same as the hits page
            m = _nested_scored(ix, qnode["nested"], text_field)
        else:
            tree = compile_query(qnode, text_field)
            m = tree_scores(ix, tree, positional_ix=positional_ix,
                            with_docs=True)
            if m is None:
                m = ix.docs
        if "score" not in m.columns:
            m = m.withColumn("score", F.lit(1.0))
        if "min_score" in body:
            # min_score wraps the whole collector chain on the wire:
            # sub-floor docs are excluded from totals AND aggs (unlike
            # post_filter)
            m = m.filter(F.col("score") >= float(body["min_score"]))
        _m_cache.append(m)
        return m

    res = SearchBodyResponse()
    capped = None
    if body.get("terminate_after"):
        # ONE terminated collection shared by hits, aggs, and the
        # terminated_early flag (on the wire they all see the same
        # collector output; three independent limit() jobs could each
        # pick a different subset). localCheckpoint materializes the
        # <= cap+1 rows once, deterministically.
        cap = int(body["terminate_after"])
        probe = (matched_frame().limit(cap + 1)
                 .localCheckpoint(eager=True))
        res["terminated_early"] = probe.count() > cap
        capped = probe.limit(cap)
        sub = {k: v for k, v in body.items() if k != "terminate_after"}
        res["hits"] = hits_page(capped, sub, text_field, source_docs)
    else:
        routed_hits = (_sorted_route(sorted_docs, body)
                       if sorted_docs is not None else None)
        if routed_hits is not None:
            res["hits"] = routed_hits
        else:
            # hits + aggs share ONE executed matched set for ordinary
            # (tree-compiled) queries: the frame persists (default
            # storage level; the ContextCleaner reclaims it when the
            # response is dropped) so the postings decode runs once,
            # not once per collection — on the wire both collectors
            # ride one query execution too.  persist() returns the
            # same object matched_frame cached, so aggs/totals reuse
            # it automatically.
            q0 = body.get("query") or {"match_all": {}}
            k0 = next(iter(q0)) if q0 else "match_all"
            shareable = (
                bool(body.get("aggs", body.get("aggregations")))
                and k0 not in ("knn", "hybrid", "neural_sparse",
                               "nested", "intervals", "multi_match",
                               "combined_fields", "has_child",
                               "has_parent")
                and not k0.startswith("span_")
                # min_score applies BEFORE rescore on the shared
                # frame but AFTER it on the direct path -- don't
                # share when both are present (ordering must match
                # the wire: floor the FINAL scores)
                and not ("rescore" in body and "min_score" in body))
            if shareable:
                m = matched_frame().persist()
                res.shared = m
                res["hits"] = search_hits(ix, body, positional_ix,
                                          text_field, vecs=vecs,
                                          source_docs=source_docs,
                                          sparse=sparse, prescored=m)
            else:
                res["hits"] = search_hits(ix, body, positional_ix,
                                          text_field, vecs=vecs,
                                          source_docs=source_docs,
                                          sparse=sparse)

    tth = body.get("track_total_hits")
    if tth is not None and tth is not False:
        # true = exact total; an int = count accurately UP TO that
        # threshold, then report a lower bound (the wire's
        # {value, relation} shape). The bounded form costs a
        # limit(threshold+1) job, never a full count.
        if tth is True:
            res["total"] = {"value": matched_frame().count(),
                            "relation": "eq"}
        else:
            thr = int(tth)
            n = matched_frame().limit(thr + 1).count()
            res["total"] = ({"value": n, "relation": "eq"} if n <= thr
                            else {"value": thr, "relation": "gte"})

    aggs_spec = body.get("aggs", body.get("aggregations"))
    if aggs_spec:
        routed = None
        if startree is not None and capped is None:
            from ..operators.startree import startree_route

            routed = startree_route(startree, body)
        if routed is not None:
            res["aggs"] = routed
        else:
            # the collector cap applies to aggregations too -- the
            # SAME materialized collection the hits came from
            matched = capped if capped is not None else matched_frame()
            res["aggs"] = run_aggs(matched, aggs_spec, text_field,
                                   background=ix.docs)
    sug_spec = body.get("suggest")
    if sug_spec:
        # the body's suggest block rides along with the search (the
        # wire shape dashboards use); each named entry dispatches to
        # the matching suggester — all dictionary-sized work
        from .boolquery import completion_suggest, term_suggest
        from .suggest import phrase_suggest

        res["suggest"] = {}
        for sname, entry in sug_spec.items():
            text = entry.get("text", entry.get("prefix", ""))
            if "term" in entry:
                p = entry["term"]
                res["suggest"][sname] = term_suggest(
                    ix, text, max_edits=int(p.get("max_edits", 2)),
                    size=int(p.get("size", 5)))
            elif "completion" in entry:
                p = entry["completion"]
                res["suggest"][sname] = completion_suggest(
                    ix, text, size=int(p.get("size", 5)))
            elif "phrase" in entry:
                p = entry["phrase"]
                if "model" not in p:
                    raise ValueError(
                        "phrase suggester needs a prebuilt bigram "
                        "model handle under 'model' (the mapping's "
                        "shingle-field analog; suggest.build_bigram_"
                        "model)")
                res["suggest"][sname] = phrase_suggest(
                    p["model"], text, size=int(p.get("size", 3)),
                    max_errors=int(p.get("max_errors", 2)))
            else:
                raise ValueError(
                    f"suggest entry {sname!r}: expected term / "
                    "completion / phrase")
    if body.get("explain"):
        # per-hit Explanation (the wire's explain:true): join a
        # term->contribution map onto the PAGE rows. Page-sized work:
        # the ids collect (<= size rows), the contribution pass
        # decodes only the query terms' blocks restricted to those
        # ids. Supported for text-scoring query kinds (match /
        # match_phrase text, query_string) -- the shapes whose score
        # is a per-term BM25 sum.
        qnode = body.get("query", {"match_all": {}})
        qkind2, qspec2 = _one(qnode)
        qtext = None
        if qkind2 == "match":
            (_f, v), = qspec2.items()
            qtext = v.get("query") if isinstance(v, dict) else str(v)
        elif qkind2 == "query_string":
            qtext = qspec2.get("query")
        if qtext is None:
            raise ValueError(
                "explain: true is supported for match / query_string "
                "bodies (per-term BM25 breakdowns); use _explain for "
                "single docs of other query kinds")
        from .query import explain_for_docs

        page_ids = [r["doc_id"] for r in
                    res["hits"].select("doc_id").collect()]
        exp = (explain_for_docs(ix, qtext, page_ids)
               .groupBy("doc_id")
               .agg(F.map_from_entries(
                   F.collect_list(F.struct("term", "contribution")))
                   .alias("_explanation")))
        res["hits"] = res["hits"].join(exp, "doc_id", "left")

    if body.get("profile"):
        # the ``profile: true`` body flag — here the honest profile
        # is the Catalyst physical plan (scan pushdowns, exchanges,
        # codegen spans), the engine's analog of Lucene's per-query
        # timing tree.
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            res["hits"].explain("formatted")
        res["profile"] = buf.getvalue()
    return res
