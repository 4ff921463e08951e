"""Declarative pipeline specs (templates, resource plans)."""
