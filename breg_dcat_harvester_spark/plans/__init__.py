"""Pipeline plans and the job control plane (SURVEY.md §3)."""
