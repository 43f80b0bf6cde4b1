"""Import-time stub for boto3 (see sqlalchemy.py in this directory): the
reference imports it at module scope; the local-CSV fuzz never uses S3."""


def client(*_a, **_k):
    raise RuntimeError("boto3 stub: S3 paths are not exercised in the fuzz")


def resource(*_a, **_k):
    raise RuntimeError("boto3 stub: S3 paths are not exercised in the fuzz")
