"""Minimal BioPython stub so the reference's pure-Python stages can run
in-repo for parity testing (they only use SeqIO.parse -> records with
.id/.seq)."""
