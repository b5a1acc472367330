"""Training engines: optimizer, schedules, MAE pretraining, fine-tuning."""
