"""End-to-end pipelines composed from kgray.stages."""
