from .build import PostingsIndex, build_index  # noqa: F401
from .docids import assign_doc_ids  # noqa: F401
from .multifield import (  # noqa: F401
    MultiFieldIndex,
    build_multi_index,
    combined_fields_topk,
    multi_match_topk,
)
from .sortedindex import SortedDocs  # noqa: F401
from .msearch import MSearchResponse, msearch  # noqa: F401
from .query import bm25_topk, bm25_topk_batch  # noqa: F401
from .aliases import AliasRegistry, alias_search  # noqa: F401
from .ltr import (  # noqa: F401
    LinearModel,
    TreeEnsembleModel,
    log_features,
    sltr_topk,
)
from .templates import TemplateRegistry, search_template  # noqa: F401
from .termvectors import term_vectors  # noqa: F401
from .metadata import field_caps, terms_enum  # noqa: F401
from .flatobject import flatten_json  # noqa: F401
