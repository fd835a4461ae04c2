"""Pure-Column expression libraries (the engine's scalar functions).

Everything here is built from ``pyspark.sql.functions`` only — no
Python UDFs — so every use stays inside whole-stage codegen and is
vectorized JVM-side at any scale.
"""
