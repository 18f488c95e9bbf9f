"""Pure-Python extraction core. No Spark imports anywhere in this
subpackage — everything is unit-testable standalone and is wired into
Spark via vectorized Arrow UDFs in ``textract_demo_spark.engine``.
"""
