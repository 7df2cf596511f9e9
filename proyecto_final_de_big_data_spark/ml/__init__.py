"""Spark MLlib feature/train/score/evaluate loop (SURVEY §2.12)."""
