"""Column-function library: cleaning, classification, text helpers."""
