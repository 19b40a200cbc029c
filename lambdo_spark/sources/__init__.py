from lambdo_spark.sources.pages import generate_pages, extract_text, PAGES_SCHEMA

__all__ = ["generate_pages", "extract_text", "PAGES_SCHEMA"]
