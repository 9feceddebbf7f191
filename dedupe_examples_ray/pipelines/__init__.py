from .dedupe import (  # noqa: F401
    dedupe_dataset,
    dedupe_documents,
    dedupe_pages,
    document_settings,
)
from .record_link import record_link  # noqa: F401
from .gazetteer import GazetteerIndex  # noqa: F401
