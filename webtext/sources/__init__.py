from .io import list_fragments, read_documents  # noqa: F401
from .manifest import CommitManifest  # noqa: F401
