"""Column-expression libraries and vectorized pandas UDFs."""
