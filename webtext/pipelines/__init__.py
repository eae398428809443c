from .extract_pipeline import (  # noqa: F401
    extract_dataset,
    read_output,
    run_extraction,
    run_pipeline_in_memory,
)
