"""Offline dataset tooling (ref: point_vs/dataset_generation/*)."""
