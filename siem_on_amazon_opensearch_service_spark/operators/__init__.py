"""Training-data pipeline operators over web-scale corpora.

Beyond the reference's own operator inventory (SURVEY.md section 2),
these are the operations a 100 TB training-data pipeline needs:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + IVF), text
analysis (language id, quality scoring, token stats, fingerprinting),
and multimodal binary-column plumbing.

Every operator is declarative DataFrame logic (native expressions in
the hot path; Catalyst plans the physical strategy) with a
deterministic cross-engine definition so the DuckDB oracle can verify
it value-identically.
"""

from . import dedup, multimodal, packing, similarity, textstats  # noqa: F401
