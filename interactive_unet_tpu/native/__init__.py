"""Native (C++) host-side acceleration: built on demand, optional at runtime."""
