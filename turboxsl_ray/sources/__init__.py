"""Sources: deterministic synthetic transcript generators and pruned
Parquet readers. Analog of the reference's XML parse front door
(/root/reference/src/parse.c:334-395) with Parquet as the table format
per BASELINE.json ``input_hint``."""
