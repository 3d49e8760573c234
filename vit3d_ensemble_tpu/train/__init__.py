"""Training machinery: losses, schedules, optimizers, jitted steps, selection."""
