"""CLI entry points (SURVEY.md R19 -> T6): train / eval / predict."""
