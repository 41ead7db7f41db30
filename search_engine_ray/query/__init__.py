"""Query compiler, ISR algebra, scorers."""
