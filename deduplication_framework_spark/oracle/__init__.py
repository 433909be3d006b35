"""Single-node NumPy/pure-Python oracle (SURVEY.md §5.2): faithful
reimplementations of the reference's sequential dedup algorithms, used as
ground truth for dup-pair recall >= 0.99 tests."""
