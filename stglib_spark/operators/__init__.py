"""Operator library — each module maps a SURVEY.md §2 family to native
DataFrame/Column plans (UDFs only where genuinely required; see §7.1's
"UDF fence")."""
