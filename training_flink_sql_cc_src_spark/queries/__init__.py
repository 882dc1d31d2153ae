"""Named query implementations, one module per SURVEY.md §2 family."""
