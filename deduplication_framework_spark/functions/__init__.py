"""Scalar/vector function families (SURVEY.md §2.2, §2.9).

Five vectorized Arrow UDF families + pure-SQL column expressions. Everything
that CAN be a builtin ``pyspark.sql.functions`` expression IS one; the Arrow
UDFs exist only where Spark lacks the primitive (shingling, MinHash, SimHash,
html→text extraction).
"""
