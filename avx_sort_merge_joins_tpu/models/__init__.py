"""Join algorithms (reference: src/joins/ - m-way, m-pass, mpsm)."""
