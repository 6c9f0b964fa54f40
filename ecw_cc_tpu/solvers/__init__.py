"""Self-consistent solvers for the ECW-CC equations (GS and ES)."""
