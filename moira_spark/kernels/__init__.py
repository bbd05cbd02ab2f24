"""Shared numerical kernels.

Every function here is plain numpy/pandas and is imported by BOTH the
pure-pandas oracle (the spec of record for reference labels) and the Spark
Arrow UDFs.  Sharing one code path is how the byte-exact scrubbed-text and
F1=1.0 keep/drop gates are met by construction (SURVEY.md §5.2).
"""
