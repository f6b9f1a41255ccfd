"""tribeca-insights-spark — a PySpark-native web-text extraction and
term-frequency analytics engine with the query/data-processing capabilities
of tribecabrasil/tribeca-insights, re-architected for Common-Crawl-scale
tables (see SURVEY.md for the reference mapping)."""

__version__ = "0.1.0"
