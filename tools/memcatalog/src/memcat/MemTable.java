package memcat;

import java.io.Serializable;
import java.util.ArrayList;
import java.util.EnumSet;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.SupportsDynamicOverwrite;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * In-memory partitioned table: rows are grouped by the (identity)
 * partition column values; a dynamic-overwrite commit atomically
 * replaces exactly the partitions present in the written data -
 * the same commit contract as an Iceberg overwritePartitions snapshot.
 */
public class MemTable implements Table, SupportsRead, SupportsWrite {
  /** tableKey -> partitionKey -> rows. Static: local-mode test store. */
  static final Map<String, Map<String, List<InternalRow>>> STORE =
      new ConcurrentHashMap<>();

  final String key;
  final Identifier ident;
  private final StructType schema;
  private final Transform[] partitioning;
  private final int[] partOrdinals;
  private final DataType[] partTypes;

  MemTable(String key, Identifier ident, StructType schema, Transform[] partitioning) {
    this.key = key;
    this.ident = ident;
    this.schema = schema;
    this.partitioning = partitioning;
    List<Integer> ords = new ArrayList<>();
    for (Transform t : partitioning) {
      // identity transforms only (partitionedBy(col("bucket")))
      String col = t.references()[0].fieldNames()[0];
      ords.add(schema.fieldIndex(col));
    }
    this.partOrdinals = ords.stream().mapToInt(Integer::intValue).toArray();
    this.partTypes = new DataType[partOrdinals.length];
    for (int i = 0; i < partOrdinals.length; i++) {
      partTypes[i] = schema.fields()[partOrdinals[i]].dataType();
    }
    STORE.putIfAbsent(key, new ConcurrentHashMap<>());
  }

  @Override
  public String name() {
    return ident.name();
  }

  @Override
  public StructType schema() {
    return schema;
  }

  @Override
  public Transform[] partitioning() {
    return partitioning;
  }

  @Override
  public Set<TableCapability> capabilities() {
    return EnumSet.of(
        TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE,
        TableCapability.OVERWRITE_DYNAMIC,
        TableCapability.TRUNCATE);
  }

  private String partKey(InternalRow row) {
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < partOrdinals.length; i++) {
      if (i > 0) sb.append('/');
      sb.append(String.valueOf(row.get(partOrdinals[i], partTypes[i])));
    }
    return sb.toString();
  }

  // ---------------- write path ----------------

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new MemWriteBuilder(this);
  }

  static class MemWriteBuilder implements WriteBuilder, SupportsDynamicOverwrite {
    private final MemTable table;
    private boolean dynamic = false;

    MemWriteBuilder(MemTable table) {
      this.table = table;
    }

    @Override
    public WriteBuilder overwriteDynamicPartitions() {
      this.dynamic = true;
      return this;
    }

    @Override
    public Write build() {
      final boolean dyn = this.dynamic;
      final MemTable t = this.table;
      return new Write() {
        @Override
        public BatchWrite toBatch() {
          return new MemBatchWrite(t, dyn);
        }
      };
    }
  }

  static class RowsMessage implements WriterCommitMessage {
    final List<InternalRow> rows;

    RowsMessage(List<InternalRow> rows) {
      this.rows = rows;
    }
  }

  static class MemBatchWrite implements BatchWrite {
    private final MemTable table;
    private final boolean dynamic;

    MemBatchWrite(MemTable table, boolean dynamic) {
      this.table = table;
      this.dynamic = dynamic;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return new MemWriterFactory();
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<InternalRow> rows = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        if (m != null) {
          rows.addAll(((RowsMessage) m).rows);
        }
      }
      Map<String, List<InternalRow>> parts = STORE.get(table.key);
      synchronized (parts) {
        if (dynamic) {
          // the overwritePartitions contract: replace exactly the
          // partitions the new data touches, leave the rest alone
          Set<String> touched = new HashSet<>();
          for (InternalRow r : rows) {
            touched.add(table.partKey(r));
          }
          for (String p : touched) {
            parts.remove(p);
          }
        }
        for (InternalRow r : rows) {
          parts.computeIfAbsent(table.partKey(r), k -> new ArrayList<>()).add(r);
        }
      }
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {}
  }

  static class MemWriterFactory implements DataWriterFactory {
    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      return new DataWriter<InternalRow>() {
        private final List<InternalRow> buf = new ArrayList<>();

        @Override
        public void write(InternalRow record) {
          buf.add(record.copy());
        }

        @Override
        public WriterCommitMessage commit() {
          return new RowsMessage(buf);
        }

        @Override
        public void abort() {
          buf.clear();
        }

        @Override
        public void close() {}
      };
    }
  }

  // ---------------- read path ----------------

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    final MemTable t = this;
    return new ScanBuilder() {
      @Override
      public Scan build() {
        return new MemScan(t);
      }
    };
  }

  static class MemPartition implements InputPartition, Serializable {
    final String tableKey;

    MemPartition(String tableKey) {
      this.tableKey = tableKey;
    }
  }

  static class MemScan implements Scan, Batch {
    private final MemTable table;

    MemScan(MemTable table) {
      this.table = table;
    }

    @Override
    public StructType readSchema() {
      return table.schema;
    }

    @Override
    public Batch toBatch() {
      return this;
    }

    @Override
    public InputPartition[] planInputPartitions() {
      return new InputPartition[] {new MemPartition(table.key)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      return new MemReaderFactory();
    }
  }

  static class MemReaderFactory implements PartitionReaderFactory {
    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      String k = ((MemPartition) partition).tableKey;
      List<InternalRow> all = new ArrayList<>();
      Map<String, List<InternalRow>> parts = STORE.get(k);
      if (parts != null) {
        synchronized (parts) {
          for (List<InternalRow> rs : parts.values()) {
            all.addAll(rs);
          }
        }
      }
      final List<InternalRow> rows = all;
      return new PartitionReader<InternalRow>() {
        private int i = -1;

        @Override
        public boolean next() {
          i++;
          return i < rows.size();
        }

        @Override
        public InternalRow get() {
          return rows.get(i);
        }

        @Override
        public void close() {}
      };
    }
  }
}
