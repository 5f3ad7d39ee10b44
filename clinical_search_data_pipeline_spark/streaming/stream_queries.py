"""Bounded streaming queries exposed through the registry."""
