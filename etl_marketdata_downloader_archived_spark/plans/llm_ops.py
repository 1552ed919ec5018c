"""North-star LLM-pipeline operator battery (SURVEY.md section 2C) -
placeholder, filled after the relational battery lands."""
