"""Source/sink operators (SURVEY §2.1)."""
