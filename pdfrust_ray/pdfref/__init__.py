"""Reference-semantics PDF extraction library (pure Python, no Ray).

A from-scratch re-implementation of the observable behavior of the
reference extractor (pdfrust, /root/reference/src/*.rs).  Every module
docstring cites the reference file:line whose behavior it pins.  The
reference's ~80 `panic!` sites are converted into `ParseError`, so the
engine can emit error *rows* instead of crashing workers.
"""

from .errors import ParseError
from .extract import extract, extract_info, Extracted

__all__ = ["ParseError", "extract", "extract_info", "Extracted"]
