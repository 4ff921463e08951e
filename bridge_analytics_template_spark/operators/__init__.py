"""Composed operators Spark lacks natively (as-of join, sessionize, …)."""
