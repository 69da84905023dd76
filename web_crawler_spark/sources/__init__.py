"""web_crawler_spark — PySpark-native crawl/parse engine (see SURVEY.md)."""
