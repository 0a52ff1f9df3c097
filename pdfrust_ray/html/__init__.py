from .extract import extract_main_text

__all__ = ["extract_main_text"]
