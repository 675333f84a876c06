"""Extensions package — populated in M4."""
