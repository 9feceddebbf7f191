from .dedupe import dedupe_dataset, dedupe_pages  # noqa: F401
