"""Scalar/array column-function library (SURVEY.md §2.7 C1-C13 plus the
north-star text / similarity / multimodal functions). Everything here
returns Column expressions — JVM-side, codegen-friendly; pandas UDFs
appear only where Spark genuinely lacks the primitive."""
