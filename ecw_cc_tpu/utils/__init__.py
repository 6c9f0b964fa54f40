"""Cross-cutting utilities: format conversions, property evaluators,
orthonormalization, initial guesses, grid/cube output."""
