"""Host-only test/benchmark utilities. Never imported on the device path."""
