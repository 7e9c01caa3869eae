"""Pipeline assembly: shared dataset builders + flagship end-to-end job."""
