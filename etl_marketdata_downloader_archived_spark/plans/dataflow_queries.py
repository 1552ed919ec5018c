"""Dataflow operator battery (SURVEY.md section 2A) - placeholder,
filled after the relational battery lands."""
