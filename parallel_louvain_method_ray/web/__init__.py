from parallel_louvain_method_ray.web.pages import synthesize_pages, PAGES_SCHEMA
from parallel_louvain_method_ray.web.extract import HtmlExtractor, extract_pages

__all__ = ["synthesize_pages", "PAGES_SCHEMA", "HtmlExtractor", "extract_pages"]
