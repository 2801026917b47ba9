from . import cef, csvfmt, jsonfmt, multiline, textfmt, winevt  # noqa: F401
