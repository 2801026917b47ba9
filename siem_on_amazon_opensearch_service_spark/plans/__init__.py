from .pruning import bm25_topk_pruned  # noqa: F401
