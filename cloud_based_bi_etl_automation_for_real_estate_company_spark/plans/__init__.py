"""Gold-layer query plans: the BI measure library (SURVEY.md §2.3–§2.6)."""
