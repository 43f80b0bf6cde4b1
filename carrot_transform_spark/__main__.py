from carrot_transform_spark.cli import cli

if __name__ == "__main__":
    cli()
