"""Engine operators: profiling core + LLM-pipeline extensions."""
