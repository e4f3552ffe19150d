"""Training subsystem: losses, data pipeline, GAN train step, schedules."""
