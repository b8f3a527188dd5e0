from eynollah_spark.kernel.textpage import (
    LineModel,
    analyze_turns_batch,
    page_diags_batch,
)

__all__ = ["LineModel", "analyze_turns_batch", "page_diags_batch"]
