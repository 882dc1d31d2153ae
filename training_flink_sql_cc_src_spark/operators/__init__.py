"""Custom operators Spark lacks natively, composed Spark-first
(SURVEY.md §4 custom-work list): latest-per-key upsert views, temporal
as-of join, CUMULATE windows, Top-N, MinHash/SimHash dedup, similarity
search."""
