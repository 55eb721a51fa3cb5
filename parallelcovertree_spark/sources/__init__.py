"""Sources & scans (SURVEY.md section 2.1)."""
