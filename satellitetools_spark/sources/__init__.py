from .docs import (  # noqa: F401
    doc_dimension,
    explode_spans,
    read_documents,
    reassemble_documents,
)
from .decode import decode_documents  # noqa: F401
