"""Source/sink layer: partitioned lake, format readers/writers."""
