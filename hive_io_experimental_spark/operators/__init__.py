"""Extension operators: dedup, similarity search, text analysis, multimodal.

Each operator is a pure DataFrame -> DataFrame function built from JVM-side
built-ins wherever possible (whole-stage codegen), dropping to Arrow-batched
pandas only where semantics demand. All are partition-parallel: no collect(),
no driver-side loops over data.
"""
