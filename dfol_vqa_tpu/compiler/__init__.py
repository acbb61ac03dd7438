"""AOT program compilation, preprocessing, codecs and validation."""
