"""Scalar / text / image / similarity function library.

Everything hot-path is built-in ``pyspark.sql.functions`` expressions
(JVM-side, codegen'd); Python mirrors exist only so the sequential
golden oracle computes byte-identical results.
"""
