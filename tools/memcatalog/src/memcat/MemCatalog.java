package memcat;

import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Minimal in-memory Spark V2 TableCatalog, built ONLY against the
 * public connector API, so tests can execute the real
 * DataFrameWriterV2 path (CTAS partitionedBy + overwritePartitions)
 * without an external table-format runtime jar. Rows live in a
 * JVM-static store, which is exactly right for local-mode test runs
 * (driver and executors share the JVM); the write protocol itself is
 * the distributed one (rows travel in WriterCommitMessages).
 */
public class MemCatalog implements TableCatalog {
  static final Map<String, MemTable> TABLES = new ConcurrentHashMap<>();

  private String name = "memcat";

  @Override
  public void initialize(String name, CaseInsensitiveStringMap options) {
    this.name = name;
  }

  @Override
  public String name() {
    return name;
  }

  private String key(Identifier ident) {
    return name + "/" + String.join(".", ident.namespace()) + "." + ident.name();
  }

  @Override
  public Identifier[] listTables(String[] namespace) {
    List<Identifier> out = new ArrayList<>();
    for (MemTable t : TABLES.values()) {
      out.add(t.ident);
    }
    return out.toArray(new Identifier[0]);
  }

  @Override
  public Table loadTable(Identifier ident) throws NoSuchTableException {
    MemTable t = TABLES.get(key(ident));
    if (t == null) {
      throw new NoSuchTableException(ident);
    }
    return t;
  }

  @Override
  public Table createTable(
      Identifier ident,
      StructType schema,
      Transform[] partitions,
      Map<String, String> properties)
      throws TableAlreadyExistsException {
    String k = key(ident);
    if (TABLES.containsKey(k)) {
      throw new TableAlreadyExistsException(ident);
    }
    MemTable t = new MemTable(k, ident, schema, partitions);
    TABLES.put(k, t);
    return t;
  }

  @Override
  public Table alterTable(Identifier ident, TableChange... changes) {
    throw new UnsupportedOperationException("alterTable");
  }

  @Override
  public boolean dropTable(Identifier ident) {
    return TABLES.remove(key(ident)) != null;
  }

  @Override
  public void renameTable(Identifier oldIdent, Identifier newIdent) {
    throw new UnsupportedOperationException("renameTable");
  }
}
