from eynollah_spark.oracle.reference import analyze_turn_naive, page_diag_naive

__all__ = ["analyze_turn_naive", "page_diag_naive"]
