"""Training driver, recorders, datastore, checkpointing.

Reference parity: ``tc_gan/drivers.py``, ``tc_gan/recorders.py``,
``tc_gan/execution.py`` (SURVEY.md §1 L4, §5).
"""
