from .io import (list_fragments, read_documents, read_documents_jsonl,  # noqa: F401
                 read_flat_csv, write_documents_jsonl)  # noqa: F401
from .manifest import CommitManifest  # noqa: F401
