"""``_search/template`` + stored search templates — the OpenSearch
surface that lets dashboards and clients ship parameterized queries
(`POST _scripts/<id>` to store a mustache template, then
`GET _search/template {"id", "params"}` to run it).

The template language is the mustache subset the real API documents:
``{{var}}`` interpolation, ``{{^var}}default{{/var}}`` fallback
sections, and ``{{#toJson}}var{{/toJson}}`` for whole-value JSON
splicing. Rendering happens on the RAW template text (that's why a
template can read ``"size": {{size}}`` and still render valid JSON),
then the rendered body executes through the ordinary
``search_body`` path — templates add zero execution machinery, only
a driver-side render step, so every plan property of the body
compiler (one postings scan, one groupBy, native gating) carries
over unchanged.

Relationship to ``index/pipelines.render_template``: that one is the
dict-level convenience (typed ``{"size": "{{k}}"}`` substitution,
``{{#var}}`` key-gating) for templates authored as Python dicts; THIS
module is the wire-exact text form for templates stored/shipped as
JSON strings, and owns the stored-template registry.
"""

from __future__ import annotations

import json
import re

from .build import PostingsIndex
from .searchbody import search_body

_SECTION = re.compile(r"\{\{\^(\w+)\}\}(.*?)\{\{/\1\}\}", re.S)
_TOJSON = re.compile(r"\{\{#toJson\}\}(\w+)\{\{/toJson\}\}")
_VAR = re.compile(r"\{\{(\w+)\}\}")


def render_template(source: str | dict, params: dict) -> dict:
    """Render a search template to an executable body dict.

    ``{{var}}`` → the param's value; ``{{^var}}text{{/var}}`` emits
    ``text`` only when ``var`` is absent (the documented
    default-value idiom); ``{{#toJson}}var{{/toJson}}`` splices the
    param as JSON (lists/objects). Unknown bare variables render
    empty, as mustache does."""
    text = source if isinstance(source, str) else json.dumps(source)

    def sub_tojson(m: re.Match) -> str:
        return json.dumps(params.get(m.group(1)))

    def sub_section(m: re.Match) -> str:
        var, body = m.group(1), m.group(2)
        return "" if var in params else body

    def sub_var(m: re.Match) -> str:
        v = params.get(m.group(1), "")
        return json.dumps(v)[1:-1] if isinstance(v, str) else str(v)

    text = _TOJSON.sub(sub_tojson, text)
    text = _SECTION.sub(sub_section, text)
    text = _VAR.sub(sub_var, text)
    try:
        return json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"template rendered to invalid JSON: {e}\n"
                         f"{text}") from e


class TemplateRegistry:
    """The ``_scripts`` store: named templates, driver metadata."""

    def __init__(self) -> None:
        self._store: dict[str, str] = {}

    def put(self, template_id: str, source: str | dict) -> None:
        self._store[template_id] = (
            source if isinstance(source, str) else json.dumps(source))

    def get(self, template_id: str) -> str:
        if template_id not in self._store:
            raise KeyError(f"no stored template {template_id!r}")
        return self._store[template_id]

    def delete(self, template_id: str) -> None:
        self._store.pop(template_id, None)


def search_template(ix: PostingsIndex, params: dict,
                    source: str | dict | None = None,
                    template_id: str | None = None,
                    registry: TemplateRegistry | None = None,
                    **kw) -> dict:
    """``_search/template``: render (inline ``source`` or stored
    ``template_id``) and execute through ``search_body``."""
    if source is None:
        if template_id is None or registry is None:
            raise ValueError("need source, or template_id + registry")
        source = registry.get(template_id)
    return search_body(ix, render_template(source, params), **kw)


def msearch_template(ix, entries: list[dict],
                     registry: TemplateRegistry | None = None,
                     **kw):
    """``_msearch/template``: each entry is ``{"source": ...}`` or
    ``{"id": "<stored>"}`` plus ``{"params": {...}}``. Rendering is
    driver-side text work; the rendered bodies then execute through
    the ``_msearch`` forest — ONE shared postings scan + shuffle for
    the whole template batch, exactly like plain ``_msearch``."""
    from .msearch import msearch

    bodies = []
    for e in entries:
        src = e.get("source")
        if src is None:
            tid = e.get("id")
            if tid is None or registry is None:
                raise ValueError(
                    "msearch_template entry needs source, or "
                    "id + registry")
            src = registry.get(tid)
        bodies.append(render_template(src, e.get("params", {})))
    return msearch(ix, bodies, **kw)
