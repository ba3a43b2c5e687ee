"""Job facades: the reference's job-shaped APIs over DataFrame plans."""
