"""Training layer (SURVEY.md T4): losses, jitted train step, Orbax

checkpoint/resume, metrics."""
