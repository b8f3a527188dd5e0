from eynollah_spark.fixtures.transcripts import (
    CorpusSpec,
    gen_turn,
    n_turns_for,
    conv_id_for,
    generate_local,
    generate_spark,
    TRANSCRIPT_SCHEMA,
)

__all__ = [
    "CorpusSpec",
    "gen_turn",
    "n_turns_for",
    "conv_id_for",
    "generate_local",
    "generate_spark",
    "TRANSCRIPT_SCHEMA",
]
