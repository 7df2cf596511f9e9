"""End-to-end pipelines composing the operator catalog (ETL → marts →
ML → export), mirroring the reference's numbered-script lifecycle as
library functions."""
