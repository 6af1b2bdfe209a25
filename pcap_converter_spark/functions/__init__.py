"""Column-expression function library (JVM-side, codegen-friendly).

- ``text``    : tokenization, quality scoring, language ID, fingerprints.
- ``vectors`` : embedding math (dot/cosine) over array<float> columns.
"""
