"""File-format sources beyond parquet (SRT subtitles, timed TSV)."""
