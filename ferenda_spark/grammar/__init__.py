"""Grammar machinery: combinators + the citation-class registry."""
