"""Sources/sinks (SURVEY.md §2.1): JSON entity reads, seed injectors."""
