"""Custom operator library (SURVEY.md §4.3): compositions of built-in Spark
primitives for the operators Spark lacks natively — dedup families, vector
similarity, text analysis, multimodal plumbing.  No Catalyst extensions
needed: every operator compiles to stock exchanges/aggregates, so AQE and
whole-stage codegen apply unchanged."""
