"""Web-payload layer: Common-Crawl-style pages → links → edge table."""
