from .build import PostingsIndex, build_index  # noqa: F401
from .docids import assign_doc_ids  # noqa: F401
from .multifield import (  # noqa: F401
    MultiFieldIndex,
    build_multi_index,
    multi_match_topk,
)
from .msearch import MSearchResponse, msearch  # noqa: F401
from .query import bm25_topk, bm25_topk_batch  # noqa: F401
