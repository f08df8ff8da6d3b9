package graft.util

/** Engine tuning for the EMBEDDED-Derby JDBC sink queries (q99 and its
  * floor probes).
  *
  * Derby's default page cache is 1,000 × 4 KB pages — 4 MB, sized for
  * 1990s heap budgets. A 172k-row upsert working set (table + unique key
  * index + staging) spills that cache constantly; 20,000 pages (~80 MB,
  * noise against the 128 GiB test JVM) keeps the whole working set
  * resident and measured ~20% off the MERGE wall. Engine properties are
  * read ONCE at Derby boot, so this must run before the first
  * `jdbc:derby:` connection of the JVM; afterwards it is a documented
  * no-op. A server-side warehouse (Postgres) is tuned by its DBA, not
  * here — this helper exists because the embedded engine's defaults are
  * the only ones the library itself is responsible for. Never overrides
  * an explicitly-set property. */
object EmbeddedDerby {
  def tune(): Unit =
    if (!sys.props.contains("derby.storage.pageCacheSize"))
      sys.props("derby.storage.pageCacheSize") = "20000"
}
