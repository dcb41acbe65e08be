"""Pipeline orchestration (the reference's pipeline.py analog)."""
