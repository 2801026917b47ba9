from .incremental import (  # noqa: F401
    IncrementalIndexer, load_incremental, stream_build,
)
