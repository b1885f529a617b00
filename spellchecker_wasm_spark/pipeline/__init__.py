from .webpages import extract_text_from_html, synthesize_pages
from .linkage import LinkageConfig, pairwise_f1, run_linkage
from .lineage import StageWriter

__all__ = [
    "extract_text_from_html",
    "synthesize_pages",
    "LinkageConfig",
    "pairwise_f1",
    "run_linkage",
    "StageWriter",
]
