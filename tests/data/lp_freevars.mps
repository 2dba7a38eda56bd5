* LP with free variables: min x1 + x2 + x3
*   s.t. 2 x1 + x2 >= 2 ; x1 + 2 x2 >= 2 ; x1 + x2 + x3 >= 0
*   x1, x2, x3 free. Optimal objective 0.
NAME          LPFREE
ROWS
 N  COST
 G  R1
 G  R2
 G  R3
COLUMNS
    X1        COST      1.0        R1        2.0
    X1        R2        1.0        R3        1.0
    X2        COST      1.0        R1        1.0
    X2        R2        2.0
    X2        R3        1.0
    X3        COST      1.0        R3        1.0
RHS
    RHS1      R1        2.0        R2        2.0
BOUNDS
 FR BND1      X1
 FR BND1      X2
 FR BND1      X3
ENDATA
