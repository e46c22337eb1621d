package org.postgresql

/** TEST DOUBLE of the PostgreSQL driver's extension interface — the one
  * method `graft.sources.PgCopySink.copyPartition` reflects on. Lives on
  * the TEST classpath only, under the driver's public package/class name
  * so the production reflection (`Class.forName("org.postgresql
  * .PGConnection")`) resolves to it in specs; production deployments see
  * the real driver's interface instead. No driver code is copied — this
  * is the minimal surface the sink calls. */
trait PGConnection {
  def getCopyAPI: AnyRef
}
