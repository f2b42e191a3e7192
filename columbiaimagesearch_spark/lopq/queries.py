"""LOPQ-backed query registrations (filled in as the lopq package lands)."""
