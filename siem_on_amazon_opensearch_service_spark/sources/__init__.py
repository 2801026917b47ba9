from . import cef, csvfmt, jsonfmt, multiline, textfmt, winevt, xmlfmt  # noqa: F401
