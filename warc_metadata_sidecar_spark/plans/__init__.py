"""Plan inspection: assert the physical plan is the one we designed for."""
