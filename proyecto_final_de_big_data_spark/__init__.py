"""PySpark-native analytics engine.

A brand-new engine re-expressing the capability surface of the reference
NYC-TLC pipeline (Israeljuarezjimenez/Proyecto-Final-de-Big-Data, surveyed
in SURVEY.md) as idiomatic Spark DataFrame/SQL operators, extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and a Structured-Streaming surface.

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
