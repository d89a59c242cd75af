"""Stages: composable zero-copy Arrow batch operators (the SMT chain)."""
