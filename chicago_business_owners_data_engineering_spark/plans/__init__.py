"""Multi-stage jobs: warehouse ETL (bronze/silver/gold), quality audit."""
