"""Training: loss terms, optax train states, pjit data-parallel steps."""
