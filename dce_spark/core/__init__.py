"""Pure-Python/NumPy CETD core — no Spark imports allowed here.

Everything in this package is deliberately dependency-light so it can be
shipped to Spark Python workers via --py-files and run inside Arrow UDF
batches with no driver-side state.
"""
